package graft.store

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Per-file HLL sketches in the sidecar (WriteOpts.sketchCols) and the
  * driver-side approxDistinct merge: accuracy vs exact, incremental
  * maintenance across appends/upserts/compaction, kv stickiness,
  * range-restricted and snapshot estimates, and the missing-sketch
  * guard.
  */
class SketchSpec extends SparkSpec {

  // 12-bit sketches carry ~1.6 % relative standard error; 5 % is ~3σ
  private def within5pct(est: Long, exact: Long): Boolean =
    math.abs(est - exact) <= math.max(1L, (exact * 0.05).toLong)

  private def mk(prefix: String): OrderedDataset = {
    val d = tmpDir(prefix) + "/ds"
    // user: ~700 distinct over 10k rows; tag: low cardinality strings
    val df = spark.range(10000).toDF("seq")
      .withColumn("user", pmod(col("seq") * 2654435761L, lit(700)))
      .withColumn("tag", concat(lit("t"), pmod(col("seq"), lit(37))))
    val ds = new OrderedDataset(spark, d)
    ds.write(df, WriteOpts("seq", NRows(1000),
      sketchCols = Seq("user", "tag")))
    ds
  }

  test("estimate within tolerance of exact, zero data IO by design") {
    val ds = mk("hll-basic")
    val exactU = ds.df.select(countDistinct("user")).head().getLong(0)
    val exactT = ds.df.select(countDistinct("tag")).head().getLong(0)
    assert(within5pct(ds.approxDistinct("user"), exactU))
    assert(ds.approxDistinct("tag") === exactT) // 37 << registers: exact
    // every file carries both sketches in the sidecar
    assert(ds.meta.files.forall(f =>
      f.hll.contains("user") && f.hll.contains("tag")))
  }

  test("appends maintain the estimate incrementally (kv-sticky cols)") {
    val ds = mk("hll-append")
    // append disjoint new users WITHOUT re-passing sketchCols
    val more = spark.range(10000, 15000).toDF("seq")
      .withColumn("user", pmod(col("seq") * 2654435761L, lit(700)) + 1000)
      .withColumn("tag", concat(lit("t"), pmod(col("seq"), lit(37))))
    ds.write(more, WriteOpts("seq", NRows(1000)))
    assert(ds.kv(OrderedDataset.SketchColsKey) === "user,tag")
    val exact = ds.df.select(countDistinct("user")).head().getLong(0)
    assert(within5pct(ds.approxDistinct("user"), exact))
  }

  test("compaction re-sketches rewritten files; estimate survives") {
    val ds = mk("hll-optimize")
    val exact = ds.df.select(countDistinct("user")).head().getLong(0)
    ds.optimize(NRows(5000)): Unit
    assert(ds.meta.files.forall(_.hll.contains("user")))
    assert(within5pct(ds.approxDistinct("user"), exact))
  }

  test("range-restricted estimate unions only overlapping files") {
    val ds = mk("hll-range")
    // [0, 3000): 3 exactly-aligned files; no boundary over-count
    val exact = ds.df.filter(col("seq") < 3000)
      .select(countDistinct("user")).head().getLong(0)
    val est = ds.approxDistinct("user", None, Some(OrdLong(3000)))
    assert(within5pct(est, exact))
    // a sub-file range may over-count (whole-file sketch) but never
    // beyond the files it touches
    val est1 = ds.approxDistinct("user", None, Some(OrdLong(500)))
    val fileExact = ds.df.filter(col("seq") < 1000)
      .select(countDistinct("user")).head().getLong(0)
    assert(est1 <= fileExact + math.max(1L, (fileExact * 0.05).toLong))
  }

  test("snapshot generations answer historical NDV from their sidecar") {
    val ds = mk("hll-asof")
    val exactBefore = ds.df.select(countDistinct("user")).head().getLong(0)
    val genBefore = ds.meta.generation
    val more = spark.range(10000, 14000).toDF("seq")
      .withColumn("user", pmod(col("seq"), lit(50)) + 5000)
      .withColumn("tag", lit("z"))
    ds.write(more, WriteOpts("seq", NRows(1000)))
    assert(within5pct(ds.approxDistinctAsOf(genBefore, "user"),
      exactBefore))
    val exactNow = ds.df.select(countDistinct("user")).head().getLong(0)
    assert(within5pct(ds.approxDistinct("user"), exactNow))
  }

  test("files written before sketching poison the merge loudly") {
    val d = tmpDir("hll-missing") + "/ds"
    val ds = new OrderedDataset(spark, d)
    val df = spark.range(1000).toDF("seq")
      .withColumn("user", pmod(col("seq"), lit(100)))
    ds.write(df, WriteOpts("seq", NRows(500))) // no sketchCols
    ds.write(
      spark.range(1000, 2000).toDF("seq")
        .withColumn("user", pmod(col("seq"), lit(100))),
      WriteOpts("seq", NRows(500), sketchCols = Seq("user")))
    val e = intercept[IllegalArgumentException](ds.approxDistinct("user"))
    assert(e.getMessage.contains("no HLL sketch"))
    // backfill reads ONLY the two pre-sketching files (metadata commit)
    assert(ds.backfillSketches() === 2)
    assert(ds.meta.files.forall(_.hll.contains("user")))
    assert(within5pct(ds.approxDistinct("user"), 100L))
    assert(ds.backfillSketches() === 0) // idempotent
  }

  test("all-null column sketches as empty, not absent") {
    val d = tmpDir("hll-null") + "/ds"
    val ds = new OrderedDataset(spark, d)
    val df = spark.range(1000).toDF("seq")
      .withColumn("user", lit(null).cast("long"))
    ds.write(df, WriteOpts("seq", NRows(500), sketchCols = Seq("user")))
    assert(ds.approxDistinct("user") === 0L)
  }
}
