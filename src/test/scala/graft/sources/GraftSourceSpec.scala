package graft.sources

import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.store.{NRows, OrderedDataset, WriteOpts}

class GraftSourceSpec extends SparkSpec {
  import spark.implicits._

  /** 10 files of 100 rows each, seq ordered_on. */
  private lazy val dir: String = {
    val d = tmpDir("graftsource") + "/ds"
    val df = spark.range(1000).toDF("seq")
      .withColumn("v", col("seq") * 2.0)
      .withColumn("grp", (col("seq") % 7).cast("int"))
    new OrderedDataset(spark, d).write(df, WriteOpts("seq", NRows(100)))
    d
  }

  private def fileIndexOf(df: org.apache.spark.sql.DataFrame): GraftFileIndex =
    df.queryExecution.analyzed.collect {
      case l: LogicalRelation =>
        l.relation.asInstanceOf[HadoopFsRelation]
          .location.asInstanceOf[GraftFileIndex]
    }.head

  test("format(graft) full read equals the parquet read") {
    val viaSource = GraftSource.table(spark, dir)
    val direct = new OrderedDataset(spark, dir).df
    assert(viaSource.schema === direct.schema)
    assert(viaSource.orderBy("seq").collect()
      === direct.orderBy("seq").collect())
  }

  test("ordered_on predicates prune files from the sidecar zone map") {
    // collect(), not count(): a COUNT over an ordered-column range is
    // legitimately answered from metadata by GraftStatsAgg (its own
    // spec), which would leave lastSelectedFiles stale here
    val t = GraftSource.table(spark, dir)
    val idx = fileIndexOf(t)

    val narrow = t.filter(col("seq") >= 250 && col("seq") < 420)
    assert(narrow.collect().length === 170)
    assert(idx.lastSelectedFiles === 3) // files [200,300),[300,400),[400,500)

    val point = t.filter(col("seq") === 777)
    assert(point.collect().length === 1)
    assert(idx.lastSelectedFiles === 1)

    val inList = t.filter(col("seq").isin(5, 505, 905))
    assert(inList.collect().length === 3)
    assert(idx.lastSelectedFiles === 3)

    val disjunct = t.filter(col("seq") < 50 || col("seq") >= 950)
    assert(disjunct.collect().length === 100)
    assert(idx.lastSelectedFiles === 2)

    // a predicate on a non-ordered column must NOT prune (conservative)
    val other = t.filter(col("grp") === 3)
    assert(other.collect().length === 143)
    assert(idx.lastSelectedFiles === 10)
  }

  test("pure SQL over a USING graft view prunes and aggregates") {
    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY VIEW graft_src_spec
          USING graft OPTIONS (path '$dir')""")
    val res = spark.sql(
      """SELECT grp, count(*) AS n, sum(v) AS sv
         FROM graft_src_spec WHERE seq >= 100 AND seq < 300
         GROUP BY grp ORDER BY grp""")
    val expected = new OrderedDataset(spark, dir).df
      .filter(col("seq") >= 100 && col("seq") < 300)
      .groupBy("grp").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .orderBy("grp")
    assert(res.collect() === expected.collect())
  }

  test("zone-map miss yields an empty result without reading data") {
    val t = GraftSource.table(spark, dir)
    val idx = fileIndexOf(t)
    assert(t.filter(col("seq") > 100000).collect().isEmpty)
    assert(idx.lastSelectedFiles === 0)
  }

  test("timestamp ordered_on prunes from SQL literals") {
    val d = tmpDir("graftsource_ts") + "/ds"
    val df = spark.range(240).toDF("i")
      .withColumn("ts", expr(
        "timestampadd(HOUR, CAST(i AS INT), TIMESTAMP_NTZ'2024-01-01 00:00:00')"))
      .withColumn("v", col("i") * 1.5)
    new OrderedDataset(spark, d).write(df, WriteOpts("ts", NRows(24)))
    val t = GraftSource.table(spark, d)
    val idx = fileIndexOf(t)
    val res = t.filter(col("ts") >= lit("2024-01-03 00:00:00").cast("timestamp_ntz")
      && col("ts") < lit("2024-01-05 00:00:00").cast("timestamp_ntz"))
    assert(res.collect().length === 48)
    assert(idx.lastSelectedFiles === 2)
  }

  test("writer surface: append is the ordered upsert with keep-last dedup") {
    val d = tmpDir("graftsource_w") + "/ds"
    val base = spark.range(100).toDF("seq").withColumn("v", lit(1.0))
    base.write.format("graft")
      .option("ordered_on", "seq").option("target_rows", "50")
      .mode("append").save(d)
    // overlapping correction: same keys 40..59, new v — keep-last on seq
    spark.range(40, 60).toDF("seq").withColumn("v", lit(9.0))
      .write.format("graft")
      .option("ordered_on", "seq").option("target_rows", "50")
      .option("duplicates_on", "seq")
      .mode("append").save(d)
    val out = GraftSource.table(spark, d).orderBy("seq").collect()
    assert(out.length === 100)
    assert(out.count(_.getDouble(1) == 9.0) === 20)

    // overwrite replaces the dataset
    spark.range(10).toDF("seq").withColumn("v", lit(0.0))
      .write.format("graft")
      .option("ordered_on", "seq").option("target_rows", "50")
      .mode("overwrite").save(d)
    assert(GraftSource.table(spark, d).count() === 10)

    intercept[IllegalStateException] {
      base.write.format("graft").option("ordered_on", "seq")
        .mode(org.apache.spark.sql.SaveMode.ErrorIfExists).save(d)
    }
  }

  test("SQL INSERT INTO a graft view is the ordered upsert") {
    val d = tmpDir("graftsource_ins") + "/ds"
    spark.range(10).toDF("seq").withColumn("v", lit(1.0))
      .write.format("graft").option("ordered_on", "seq")
      .option("target_rows", "5").save(d)
    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY VIEW graft_ins
          USING graft OPTIONS (path '$d', ordered_on 'seq',
            target_rows '5', duplicates_on 'seq')""")
    // append = upsert (overlapping key 5 replaced, new key 100 added)
    spark.sql("INSERT INTO graft_ins VALUES (5, 9.0), (100, 2.0)")
    val rows = spark.sql(
      "SELECT seq, v FROM graft_ins ORDER BY seq").collect()
    assert(rows.length === 11)
    assert(rows.find(_.getLong(0) == 5L).get.getDouble(1) === 9.0)
    // the write went through the store: sidecar-tracked f-files only
    val names = new java.io.File(d).list().toSeq
    assert(!names.exists(_.startsWith("part-")), names.mkString(","))
    assert(new OrderedDataset(spark, d).meta.totalRows === 11L)
    // a view with no write options inserts via the sidecar's ordering
    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY VIEW graft_ins_ro
          USING graft OPTIONS (path '$d')""")
    spark.sql("INSERT INTO graft_ins_ro VALUES (200, 3.0)")
    assert(spark.table("graft_ins_ro").count() === 12)
    // INSERT OVERWRITE replaces the dataset
    spark.sql("INSERT OVERWRITE graft_ins VALUES (1, 1.0)")
    assert(spark.sql("SELECT * FROM graft_ins").collect().length === 1)
  }

  test("secondary-column zone maps (data skipping) prune correlated predicates") {
    val t = GraftSource.table(spark, dir)
    val idx = fileIndexOf(t)

    // v = seq * 2.0 is perfectly correlated with the file layout:
    // v in [500, 840) lives in files [200,300),[300,400),[400,500)
    val byV = t.filter(col("v") >= 500.0 && col("v") < 840.0)
    assert(byV.count() === 170)
    assert(idx.lastSelectedFiles === 3)

    // uncorrelated column (grp = seq % 7 spans every file): no pruning,
    // correct result
    val byGrp = t.filter(col("grp") === 2)
    assert(byGrp.count() === 143)
    assert(idx.lastSelectedFiles === 10)
  }

  test("string zone maps prune clustered values; truncation stays correct") {
    val d = tmpDir("graftsource_str") + "/ds"
    // cat is clustered with seq (c0 for 0..99, c1 for 100..199, …);
    // pad is a long string (> 64 chars) whose max prefix is unusable
    val df = spark.range(500).toDF("seq")
      .withColumn("cat", concat(lit("c"), (col("seq") / 100).cast("int")))
      .withColumn("pad", concat(lit("p"), lpad(col("seq").cast("string"),
        100, "0")))
    new OrderedDataset(spark, d).write(df, WriteOpts("seq", NRows(100)))
    val t = GraftSource.table(spark, d)
    val idx = fileIndexOf(t)

    assert(t.filter(col("cat") === "c3").count() === 100)
    assert(idx.lastSelectedFiles === 1)

    // long-string column: min prefix still prunes a below-range point
    assert(t.filter(col("pad") === "a_nothing").count() === 0)
    assert(idx.lastSelectedFiles === 0)
    // ...but an above-range probe cannot use a truncated max: admits all
    assert(t.filter(col("pad") === "z_nothing").count() === 0)
    assert(idx.lastSelectedFiles === 5)
  }

  test("col_stats=false skips secondary stats; reads stay correct") {
    val d = tmpDir("graftsource_nostats") + "/ds"
    spark.range(200).toDF("seq").withColumn("v", col("seq") * 3.0)
      .write.format("graft")
      .option("ordered_on", "seq").option("target_rows", "50")
      .option("col_stats", "false")
      .mode("append").save(d)
    val ds = new OrderedDataset(spark, d)
    assert(ds.meta.files.forall(_.cols.isEmpty))
    val t = GraftSource.table(spark, d)
    val idx = fileIndexOf(t)
    assert(t.filter(col("v") < 30.0).count() === 10)
    assert(idx.lastSelectedFiles === 4) // no secondary stats → no pruning
    assert(t.filter(col("seq") < 10).collect().length === 10)
    assert(idx.lastSelectedFiles === 1) // ordered col still prunes
  }

  test("selectFiles is conservative on expressions it cannot analyze") {
    import org.apache.spark.sql.catalyst.expressions.{Add, AttributeReference, LessThan, Literal}
    import org.apache.spark.sql.types.LongType
    val m = new OrderedDataset(spark, dir).meta
    val seqAttr = AttributeReference("seq", LongType)()
    // unsupported shape: seq + 1 < 10 → no pruning
    val all = GraftFileIndex.selectFiles(m,
      Seq(LessThan(Add(seqAttr, Literal(1L)), Literal(10L))))
    assert(all.size === m.files.size)
  }
}
