package graft.store

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Additive schema evolution (`WriteOpts.mergeSchema`): new columns
  * extend the dataset, missing ones null-fill, old files serve the
  * newer columns as nulls through the sidecar-schema read.
  */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("append with a new column evolves the schema; old rows read null") {
    val d = tmpDir("evolve") + "/ds"
    val ds = new OrderedDataset(spark, d)
    ds.write((0L until 100L).map(i => (i, i * 2.0)).toDF("seq", "v"),
      WriteOpts("seq", NRows(40)))
    // non-overlapping append carrying a new column
    ds.write((100L until 150L).map(i => (i, i * 2.0, s"s$i"))
      .toDF("seq", "v", "tag"),
      WriteOpts("seq", NRows(40), mergeSchema = true))
    assert(ds.df.columns.toSeq === Seq("seq", "v", "tag"))
    assert(ds.df.count() === 150)
    assert(ds.df.filter(col("tag").isNull).count() === 100)
    assert(ds.df.filter(col("tag") === "s120").select("seq")
      .head().getLong(0) === 120L)
    // range reads resolve the evolved column over old files too
    assert(ds.rangeDF(Some(OrdLong(0)), Some(OrdLong(10)))
      .select("tag").distinct().head().isNullAt(0))
  }

  test("append missing a stored column null-fills it") {
    val d = tmpDir("evolve2") + "/ds"
    val ds = new OrderedDataset(spark, d)
    ds.write((0L until 50L).map(i => (i, i * 2.0)).toDF("seq", "v"),
      WriteOpts("seq", NRows(40)))
    ds.write((50L until 60L).map(i => Tuple1(i)).toDF("seq"),
      WriteOpts("seq", NRows(40), mergeSchema = true))
    assert(ds.df.columns.toSeq === Seq("seq", "v"))
    assert(ds.df.filter(col("v").isNull).count() === 10)
  }

  test("overlapping evolved upsert merges old and new columns") {
    val d = tmpDir("evolve3") + "/ds"
    val ds = new OrderedDataset(spark, d)
    ds.write((0L until 100L).map(i => (i, i * 2.0)).toDF("seq", "v"),
      WriteOpts("seq", NRows(40)))
    // overlapping correction carrying a new column, keep-last on seq
    ds.write((40L until 60L).map(i => (i, -1.0, "fix"))
      .toDF("seq", "v", "tag"),
      WriteOpts("seq", NRows(40), duplicatesOn = Some(Seq("seq")),
        mergeSchema = true))
    assert(ds.df.count() === 100)
    assert(ds.df.filter(col("tag") === "fix").count() === 20)
    assert(ds.df.filter(col("seq") === 45L).select("v").head()
      .getDouble(0) === -1.0)
    assert(ds.df.filter(col("seq") === 99L).select("tag").head().isNullAt(0))
  }

  test("type changes are rejected in both modes") {
    val d = tmpDir("evolve4") + "/ds"
    val ds = new OrderedDataset(spark, d)
    ds.write((0L until 10L).map(i => (i, i * 2.0)).toDF("seq", "v"),
      WriteOpts("seq", NRows(40)))
    val bad = (10L until 20L).map(i => (i, s"nope$i")).toDF("seq", "v")
    intercept[IllegalArgumentException](
      ds.write(bad, WriteOpts("seq", NRows(40))))
    intercept[IllegalArgumentException](
      ds.write(bad, WriteOpts("seq", NRows(40), mergeSchema = true)))
  }

  test("case-variant batch columns conform to the stored spelling") {
    val d = tmpDir("evolve6") + "/ds"
    val ds = new OrderedDataset(spark, d)
    ds.write((0L until 20L).map(i => (i, i * 2.0)).toDF("seq", "v"),
      WriteOpts("seq", NRows(40)))
    // "V" matches stored "v" case-insensitively: same column, not a twin
    ds.write((20L until 30L).map(i => (i, -1.0)).toDF("seq", "V"),
      WriteOpts("seq", NRows(40), mergeSchema = true))
    assert(ds.df.columns.toSeq === Seq("seq", "v"))
    assert(ds.df.filter(col("v") === -1.0).count() === 10)
    // a case-variant TYPE change is still a type error
    intercept[IllegalArgumentException](
      ds.write((30L until 40L).map(i => (i, s"x$i")).toDF("seq", "V"),
        WriteOpts("seq", NRows(40), mergeSchema = true)))
    // a batch whose own columns case-collide is rejected outright
    val collide = (30L until 40L).map(i => (i, 1.0, 2.0))
      .toDF("seq", "w", "W")
    intercept[IllegalArgumentException](
      ds.write(collide, WriteOpts("seq", NRows(40), mergeSchema = true)))
  }

  test("graft source merge_schema option + evolved SQL reads") {
    val d = tmpDir("evolve5") + "/ds"
    (0L until 30L).map(i => (i, i * 1.0)).toDF("seq", "v")
      .write.format("graft").option("ordered_on", "seq")
      .option("target_rows", "10").save(d)
    (30L until 40L).map(i => (i, i * 1.0, i % 3)).toDF("seq", "v", "k")
      .write.format("graft").option("ordered_on", "seq")
      .option("target_rows", "10").option("merge_schema", "true")
      .mode("append").save(d)
    val t = graft.sources.GraftSource.table(spark, d)
    assert(t.columns.toSeq === Seq("seq", "v", "k"))
    assert(t.filter(col("k").isNull).count() === 30)
    assert(t.filter(col("k") === 1).count() ===
      (30L until 40L).count(_ % 3 == 1))
  }
}
