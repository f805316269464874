package graft.store

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Secondary-column clustering (WriteOpts.clusterBy / optimize's
  * re-layout): file boundaries stay ranges of the ordered column, but
  * rows inside each file lead with the cluster columns — tight parquet
  * row-group stats on them — and the setting is sticky across appends
  * and compactions via the sidecar kv.
  */
class ClusterSpec extends SparkSpec {

  private def fileValues(path: String, colName: String): Seq[Long] =
    spark.read.parquet(path).select(colName).collect()
      .map(_.getLong(0)).toSeq

  test("optimize(clusterBy) re-lays out every file; content identical") {
    val d = tmpDir("cluster") + "/ds"
    val ds = new OrderedDataset(spark, d)
    // seq strictly ordered; secondary s interleaves within any range
    val df = spark.range(1000).toDF("seq")
      .withColumn("s", col("seq") % 10)
    ds.write(df, WriteOpts("seq", NRows(250)))
    val before = ds.meta.files
    assert(before.size == 4)
    // unclustered layout: s interleaves inside a file
    assert(!fileValues(s"$d/${before.head.name}", "s")
      .sliding(2).forall(p => p.head <= p.last))

    val rewritten = ds.optimize(NRows(250), clusterBy = Seq("s"))
    assert(rewritten >= 1)

    // content identical, zone maps still non-overlapping on seq
    assert(ds.df.count() == 1000)
    assert(ds.df.agg(sum("seq"), sum("s")).collect().head.toSeq ==
      Seq(499500L, 4500L))
    val m = ds.meta
    m.files.sliding(2).foreach {
      case Seq(a, b) => assert(a.max < b.min)
      case _ => ()
    }
    // every file internally sorted by the cluster column
    m.files.foreach { f =>
      val s = fileValues(s"$d/${f.name}", "s")
      assert(s == s.sorted, s"${f.name} not clustered")
    }
    assert(m.kv(OrderedDataset.ClusterColsKey) == "s")

    // sticky: a later append keeps clustering without being asked
    ds.write(spark.range(1000, 1250).toDF("seq")
        .withColumn("s", col("seq") % 10),
      WriteOpts("seq", NRows(250)))
    val newest = ds.meta.files.maxBy(_.id)
    val sNew = fileValues(s"$d/${newest.name}", "s")
    assert(sNew == sNew.sorted, "appended file not clustered")

    // re-running with the SAME cluster set is a no-op (files on target)
    assert(ds.optimize(NRows(250), clusterBy = Seq("s")) == 0)
  }

  test("cluster-only rewrites CHUNK into multi-file jobs, never " +
      "straddling a size run") {
    val d = tmpDir("clusterchunk") + "/ds"
    val ds = new OrderedDataset(spark, d)
    // 10 files of 100; then two undersized neighbors in the middle
    // (positions 4,5 replaced by 25-row files via a ranged rewrite)
    ds.write(spark.range(1000).toDF("seq").withColumn("s", col("seq") % 7),
      WriteOpts("seq", NRows(100)))
    assert(ds.meta.files.size == 10)
    ds.delete(Some(OrdLong(400L)), Some(OrdLong(600L)))
    ds.write(spark.range(400, 450).toDF("seq")
        .withColumn("s", col("seq") % 7),
      WriteOpts("seq", NRows(25)))
    ds.write(spark.range(550, 600).toDF("seq")
        .withColumn("s", col("seq") % 7),
      WriteOpts("seq", NRows(25)))
    val nFiles = ds.meta.files.size
    assert(nFiles > 10, s"expected undersized middle files, got $nFiles")
    // one optimize pass: the undersized middle forms size run(s); the
    // on-target head and tail each become ONE chunked cluster run —
    // NOT one job per file (the 100x fixture measured ~1.7 s of
    // job+commit overhead per single-file run)
    val runs = ds.optimize(NRows(100), clusterBy = Seq("s"))
    val singleFileCeiling = ds.meta.files.size
    assert(runs < 10,
      s"expected chunked cluster runs, got $runs (≈ one per file)")
    // content identical, every file clustered, zone maps disjoint
    assert(ds.df.count() == 900)
    ds.meta.files.foreach { f =>
      val s = fileValues(s"$d/${f.name}", "s")
      assert(s == s.sorted, s"${f.name} not clustered")
    }
    ds.meta.files.sliding(2).foreach {
      case Seq(a, b) => assert(a.max < b.min)
      case _ => ()
    }
    assert(singleFileCeiling > 0)
  }

  test("clusterBy on write; range scans and upsert dedup still exact") {
    val d = tmpDir("cluster2") + "/ds"
    val ds = new OrderedDataset(spark, d)
    ds.write(spark.range(500).toDF("seq").withColumn("s", col("seq") % 7),
      WriteOpts("seq", NRows(100), clusterBy = Seq("s")))
    // pruned range read unaffected by intra-file layout
    val got = ds.rangeDF(Some(OrdLong(100)), Some(OrdLong(200)))
      .select("seq").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == (100L until 200L))
    // keep-last upsert over a clustered dataset stays exact
    ds.write(spark.range(150, 160).toDF("seq")
        .withColumn("s", lit(99L)),
      WriteOpts("seq", NRows(100), duplicatesOn = Some(Seq("seq"))))
    assert(ds.df.filter(col("s") === 99L).count() == 10)
    assert(ds.df.count() == 500)
  }
}
