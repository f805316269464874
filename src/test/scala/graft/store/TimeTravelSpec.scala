package graft.store

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Generation-retained sidecars: every commit archives the previous
  * sidecar next to the retired data files it references, so any
  * generation inside the reader grace window is an addressable
  * snapshot (`dfAsOf` — Delta's VERSION AS OF analog).
  */
class TimeTravelSpec extends SparkSpec {

  test("dfAsOf reads each retained generation's exact content") {
    val d = tmpDir("tt") + "/ds"
    val ds = new OrderedDataset(spark, d)
    ds.write(spark.range(100).toDF("seq").withColumn("v", lit(1.0)),
      WriteOpts("seq", NRows(40)))
    val g1 = ds.generation
    assert(g1 >= 1L)

    // overwrite-style correction: overlapping upsert replaces files
    ds.write(
      spark.range(20, 60).toDF("seq").withColumn("v", lit(2.0)),
      WriteOpts("seq", NRows(40), duplicatesOn = Some(Seq("seq"))))
    val g2 = ds.generation
    assert(g2 == g1 + 1)

    // delete bumps again
    ds.delete(Some(OrdLong(80)), None)
    val g3 = ds.generation
    assert(g3 == g2 + 1)
    assert(ds.generations == Seq(g1, g2, g3))

    // live view: 80 rows, corrected values in [20,60)
    assert(ds.df.count() == 80)
    // snapshot g1: the original 100 rows, all v=1.0
    val snap1 = ds.dfAsOf(g1)
    assert(snap1.count() == 100)
    assert(snap1.filter(col("v") === 2.0).count() == 0)
    // snapshot g2: corrections applied, delete not yet
    val snap2 = ds.dfAsOf(g2)
    assert(snap2.count() == 100)
    assert(snap2.filter(col("v") === 2.0).count() == 40)
    assert(snap2.filter(col("seq") >= 80).count() == 20)
    // the live generation is addressable too
    assert(ds.dfAsOf(g3).count() == 80)
  }

  test("generation option on the graft source serves the snapshot") {
    val d = tmpDir("tt-src") + "/ds"
    val ds = new OrderedDataset(spark, d)
    ds.write(spark.range(50).toDF("seq").withColumn("v", lit(1.0)),
      WriteOpts("seq", NRows(25)))
    val g1 = ds.generation
    ds.write(spark.range(50, 70).toDF("seq").withColumn("v", lit(2.0)),
      WriteOpts("seq", NRows(25)))

    assert(spark.read.format("graft").load(d).count() == 70)
    val snap = spark.read.format("graft")
      .option("generation", g1.toString).load(d)
    assert(snap.count() == 50)
    assert(snap.agg(max(col("v"))).head().getDouble(0) == 1.0)
    // zone-map pruning still works against the snapshot's file list
    assert(snap.filter(col("seq") < 25).count() == 25)
    // snapshots are read-only
    val err = intercept[Exception] {
      spark.range(3).toDF("seq").withColumn("v", lit(9.0))
        .write.format("graft").option("generation", g1.toString)
        .option("ordered_on", "seq").mode("append").save(d)
    }
    assert(err.getMessage.contains("time-travel"))
  }

  test("metadata-only aggregates answer from the snapshot's sidecar") {
    val d = tmpDir("tt-stats") + "/ds"
    val ds = new OrderedDataset(spark, d)
    ds.write(spark.range(100).toDF("seq"), WriteOpts("seq", NRows(40)))
    val g1 = ds.generation
    ds.write(spark.range(100, 250).toDF("seq"), WriteOpts("seq", NRows(40)))

    graft.sources.GraftStatsAgg.register(spark)
    val snapStats = spark.read.format("graft")
      .option("generation", g1.toString).load(d)
      .agg(count(lit(1)).as("n"), max(col("seq")).as("hi"))
    // the rewrite fires against the SNAPSHOT's file list: zero scans,
    // and the answer is generation-1's, not the live dataset's
    assert(snapStats.queryExecution.optimizedPlan.collectFirst {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }.nonEmpty)
    assert(snapStats.head() == org.apache.spark.sql.Row(100L, 99L))
  }

  test("history diffs retained generations into a commit log") {
    val d = tmpDir("tt-hist") + "/ds"
    val ds = new OrderedDataset(spark, d)
    ds.write(spark.range(100).toDF("seq"), WriteOpts("seq", NRows(50)))
    ds.write(spark.range(100, 150).toDF("seq"), WriteOpts("seq", NRows(50)))
    ds.delete(Some(OrdLong(0)), Some(OrdLong(50)))
    val h = ds.history
    assert(h.map(_.generation) == ds.generations)
    assert(h.head.filesAdded.isEmpty) // oldest has no predecessor row
    val byGen = h.map(i => i.generation -> i).toMap
    // gen 1: 100 rows / 2 files; gen 2: append 50; gen 3: delete 50
    assert(h(0).totalRows == 100 && h(0).nFiles == 2)
    assert(h(1).rowsDelta.contains(50L))
    assert(h(2).rowsDelta.contains(-50L))
    assert(h(2).filesRemoved.contains(1)) // file-aligned metadata drop
    assert(byGen(ds.generation).totalRows == ds.meta.totalRows)
  }

  test("kv updates version too; vacuum(0) ages snapshots out") {
    val d = tmpDir("tt-kv") + "/ds"
    val ds = new OrderedDataset(spark, d)
    ds.write(spark.range(10).toDF("seq"), WriteOpts("seq", NRows(100)))
    val g1 = ds.generation
    ds.updateKv(Map("note" -> "x"))
    assert(ds.generation == g1 + 1)
    assert(ds.metaAsOf(g1).kv.get("note").isEmpty)

    ds.vacuum(0L)
    assert(ds.generations == Seq(ds.generation))
    val err = intercept[IllegalArgumentException](ds.dfAsOf(g1))
    assert(err.getMessage.contains("not retained"))
  }

  test("changeFeed diffs generations row-level, delete+insert on update") {
    val d = tmpDir("tt-cdc") + "/ds"
    val ds = new OrderedDataset(spark, d)
    ds.write(spark.range(100).toDF("seq").withColumn("v", lit(1.0)),
      WriteOpts("seq", NRows(40)))
    val g1 = ds.generation
    // correction upsert: rows [20,60) change value; rest survive via
    // rewrite (same content, different file) and must NOT appear
    ds.write(
      spark.range(20, 60).toDF("seq").withColumn("v", lit(2.0)),
      WriteOpts("seq", NRows(40), duplicatesOn = Some(Seq("seq"))))
    val g2 = ds.generation

    val cdc = ds.changeFeed(g1, g2)
    val ins = cdc.filter(col("_change_type") === "insert")
    val del = cdc.filter(col("_change_type") === "delete")
    assert(ins.count() == 40 && del.count() == 40)
    assert(ins.filter(col("v") === 2.0).count() == 40)
    assert(del.filter(col("v") === 1.0).count() == 40)
    assert(ins.agg(min("seq"), max("seq")).collect().head
      .toSeq == Seq(20L, 59L))

    // semantics = exceptAll of the two snapshots, both directions
    val manual = ds.dfAsOf(g2).exceptAll(ds.dfAsOf(g1)).count() +
      ds.dfAsOf(g1).exceptAll(ds.dfAsOf(g2)).count()
    assert(cdc.count() == manual)

    // grace window over: changeFeed against an aged-out generation fails
    // loudly (the live one still addresses)
    assert(ds.changeFeed(g1, g2).count() == 80)
  }

  test("changeFeed reads only files the commits touched") {
    val d = tmpDir("tt-cdc2") + "/ds"
    val ds = new OrderedDataset(spark, d)
    ds.write(spark.range(100).toDF("seq"), WriteOpts("seq", NRows(25)))
    val g1 = ds.generation
    val untouched = ds.meta.files.map(_.name).toSet
    // pure append beyond the existing range: no old file overlaps
    ds.write(spark.range(100, 130).toDF("seq"), WriteOpts("seq", NRows(25)))
    val g2 = ds.generation

    val cdc = ds.changeFeed(g1, g2)
    val scanned = cdc.inputFiles.map(_.split("/").last).toSet
    assert(scanned.intersect(untouched).isEmpty,
      s"changeFeed scanned untouched files: ${scanned & untouched}")
    assert(cdc.filter(col("_change_type") === "delete").count() == 0)
    assert(cdc.count() == 30)
  }
}
