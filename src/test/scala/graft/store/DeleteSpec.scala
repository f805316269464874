package graft.store

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Range delete: metadata-only drops for covered files, boundary-only
  * rewrites, reader grace retention, and the emptied-dataset edge.
  */
class DeleteSpec extends SparkSpec {

  private def mk(prefix: String): (OrderedDataset, String) = {
    val d = tmpDir(prefix) + "/ds"
    val df = spark.range(1000).toDF("seq")
      .withColumn("v", col("seq") * 2.0)
    val ds = new OrderedDataset(spark, d)
    ds.write(df, WriteOpts("seq", NRows(100))) // 10 files of 100
    (ds, d)
  }

  test("file-aligned range deletes metadata-only (zero rewrites)") {
    val (ds, dir) = mk("del-aligned")
    val before = ds.meta.files.map(_.name).toSet
    // files are [0,100),[100,200)...: [200..500) covers 3 files exactly
    val rep = ds.delete(Some(OrdLong(200)), Some(OrdLong(500)))
    assert(rep === DeleteReport(3, 0, 7, 300L))
    assert(ds.meta.files.size === 7)
    assert(ds.df.count() === 700)
    assert(ds.df.filter(col("seq") >= 200 && col("seq") < 500).count() === 0)
    // dropped files are retired, not deleted: a reader holding the old
    // plan keeps reading until the grace window passes
    val gone = before -- ds.meta.files.map(_.name).toSet
    assert(gone.size === 3)
    gone.foreach { n =>
      assert(new java.io.File(s"$dir/$n").exists(), s"$n reaped too early")
    }
  }

  test("unaligned range rewrites only the two boundary files") {
    val (ds, _) = mk("del-boundary")
    val rep = ds.delete(Some(OrdLong(250)), Some(OrdLong(750)))
    // [300,700) covered -> 4 dropped; [200,300) and [700,800) rewritten
    assert(rep.filesDropped === 4)
    assert(rep.filesRewritten === 2)
    assert(rep.rowsDeleted === 500L)
    assert(ds.df.count() === 500)
    val left = ds.df.agg(
      sum(when(col("seq") >= 250 && col("seq") < 750, 1).otherwise(0)),
      min("seq"), max("seq")).head()
    assert(left.getLong(0) === 0L)
    assert(left.getLong(1) === 0L && left.getLong(2) === 999L)
    // zone maps stay exact after the rewrite
    val m = ds.meta
    assert(m.files.map(_.rows).sum === 500L)
    m.files.foreach(f => assert(f.min <= f.max))
  }

  test("one-sided and no-op deletes") {
    val (ds, _) = mk("del-sided")
    assert(ds.delete(Some(OrdLong(5000)), None)
      === DeleteReport(0, 0, 10, 0L)) // no-op past the end
    val rep = ds.delete(None, Some(OrdLong(150))) // everything below 150
    assert(rep.filesDropped === 1 && rep.filesRewritten === 1)
    assert(ds.df.count() === 850)
    assert(ds.df.agg(min("seq")).head().getLong(0) === 150L)
    intercept[IllegalArgumentException](ds.delete(None, None))
    intercept[IllegalArgumentException]( // empty range
      ds.delete(Some(OrdLong(500)), Some(OrdLong(500))))
  }

  test("an idempotent repeat delete is metadata-cheap: boundary files " +
      "with an empty interior are NOT re-rewritten") {
    val (ds, _) = mk("del-repeat")
    val rep1 = ds.delete(Some(OrdLong(250)), Some(OrdLong(750)))
    assert(rep1.filesRewritten === 2 && rep1.rowsDeleted === 500L)
    // premise: the rewrite packs both boundary survivors into a file
    // whose [min, max] STRADDLES the deleted range — wide stats
    // around an empty interior, which is what makes the naive repeat
    // re-rewrite (and what the fix detects by counting)
    assert(ds.meta.files.exists(f =>
      f.min < OrdLong(750) && f.max >= OrdLong(250) &&
        !(f.min >= OrdLong(250) && f.max < OrdLong(750))),
      s"no straddling file — repeat-delete premise broke: ${ds.meta.files}")
    val filesAfter = ds.meta.files.map(f => (f.name, f.rows)).toSet
    // the repeat: the two boundary files still STRADDLE 250/750 by
    // min/max, but the survivor count proves the interior empty —
    // zero files touched, zero rows deleted, file set bit-identical
    val rep2 = ds.delete(Some(OrdLong(250)), Some(OrdLong(750)))
    assert(rep2 === DeleteReport(0, 0, ds.meta.files.size, 0L), s"$rep2")
    assert(ds.meta.files.map(f => (f.name, f.rows)).toSet === filesAfter,
      "repeat delete must not rewrite any file")
    assert(ds.df.count() === 500)
    // a SUB-range of the emptied hole is equally a no-op
    val rep3 = ds.delete(Some(OrdLong(300)), Some(OrdLong(700)))
    assert(rep3 === DeleteReport(0, 0, ds.meta.files.size, 0L), s"$rep3")
  }

  test("deleting every row leaves a readable empty dataset") {
    val (ds, _) = mk("del-all")
    val rep = ds.delete(Some(OrdLong(0)), Some(OrdLong(100000)))
    assert(rep.filesDropped === 10 && rep.filesRewritten === 0)
    assert(ds.meta.files.isEmpty)
    assert(ds.df.count() === 0)
    assert(ds.df.columns.toSeq === Seq("seq", "v")) // schema survives
    // and the dataset accepts new writes afterwards
    ds.write(spark.range(5).toDF("seq").withColumn("v", lit(1.0)),
      WriteOpts("seq", NRows(100)))
    assert(ds.df.count() === 5)
  }

  test("vacuum reaps retirees on demand; default window keeps them") {
    val (ds, dir) = mk("del-vacuum")
    val before = ds.meta.files.map(_.name).toSet
    ds.delete(Some(OrdLong(200)), Some(OrdLong(500)))
    val retired = before -- ds.meta.files.map(_.name).toSet
    assert(retired.size === 3)
    // within the grace window a vacuum at the default age keeps them
    assert(ds.vacuum() === 0)
    retired.foreach(n => assert(new java.io.File(s"$dir/$n").exists()))
    // an explicit zero-age vacuum reclaims the disk now
    assert(ds.vacuum(0L) === 3)
    retired.foreach(n => assert(!new java.io.File(s"$dir/$n").exists()))
    assert(ds.df.count() === 700) // live data untouched
  }

  test("delete preserves secondary-column stats for data skipping") {
    val (ds, _) = mk("del-stats")
    ds.delete(Some(OrdLong(250)), Some(OrdLong(750)))
    val rewritten = ds.meta.files.filter(f => f.min <= OrdLong(250))
    assert(rewritten.nonEmpty)
    assert(ds.meta.files.forall(_.cols.contains("v")))
  }
}
