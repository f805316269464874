package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.{Bm25Index, DedupIndex, IndexSegments}
import graft.store.{NRows, OrderedDataset, WriteOpts}

/** Incremental-index ADD-COST A/B (VERDICT r11 #1's "Done" criterion):
  * measure the wall cost of adding a small increment to a large
  * store-backed index, r12 delta-segment path vs the r11 in-place
  * ordered upsert, on the same corpus split (99% indexed, 1% added).
  * The claim under test: segment adds are ∝ increment; in-place adds
  * are ∝ index (uniformly-hashed keys overlap every file).
  *
  * Also verifies (cheaply) that both paths answer a probe identically
  * before timing anything — a fast wrong add would be worthless.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.AddBench
  * Emits one JSON line; SPARK_GRAFT_BENCH_OUT redirects the record.
  */
object AddBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.configure(spark)

    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .persist()
    val corpus = docs.filter(col("doc_id") % 100 =!= 0)
    // SPARK_GRAFT_ADD_BATCH_DIR: take the increment from a DIFFERENT
    // (smaller) scale dir — the fixed-daily-batch series: increment
    // size constant while the indexed corpus grows 1x/10x/100x, so the
    // segment arm's claimed flatness is measured, not extrapolated.
    // Batch ids shift past every corpus id (disjoint by contract).
    val batch = sys.env.get("SPARK_GRAFT_ADD_BATCH_DIR") match {
      case Some(bd) => Tables.documents(spark, bd)
        .select((col("doc_id") + 1000000000L).as("doc_id"), col("text"))
        .filter(col("doc_id") % 100 === 0)
      case None => docs.filter(col("doc_id") % 100 === 0)
    }
    val nCorpus = corpus.count(); val nBatch = batch.count()
    // postings rowsPerFile sized like the fixture (≈10+ files)
    val rpf = math.max(2000L, nCorpus * 4L / 10L)
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val root = s"/tmp/graft_addbench_${System.currentTimeMillis()}"

    // ---- bm25: build two identical indexes, add via each path ----
    val bmSeg = s"$root/bm25_seg"; val bmIp = s"$root/bm25_ip"
    Bm25Index.build(spark, bmSeg, corpus, "doc_id", "text", rpf)
    Bm25Index.build(spark, bmIp, corpus, "doc_id", "text", rpf)
    val tBmSeg = timed(Bm25Index.add(spark, bmSeg, batch,
      "doc_id", "text", rpf))
    val tBmIp = timed(Bm25Index.addInPlace(spark, bmIp, batch,
      "doc_id", "text", rpf))
    // equivalence check on a small query set (results, not timings)
    val q = spark.createDataFrame(Seq((0L, "the quick data model"),
      (1L, "alpha beta gamma"))).toDF("q_id", "q_text")
    val a = Bm25Index.topK(spark, bmSeg, q, 10).collect().toSeq
    val b = Bm25Index.topK(spark, bmIp, q, 10).collect().toSeq
    require(a == b, "A/B arms disagree on bm25 topK — abort")

    // ---- digest: same A/B (in-place arm = the r11 direct upsert) ----
    val dgSeg = s"$root/dg_seg"; val dgIp = s"$root/dg_ip"
    val dgRpf = math.max(2000L, nCorpus / 10L)
    DedupIndex.buildDigest(spark, dgSeg, corpus, "doc_id", "text", dgRpf)
    DedupIndex.buildDigest(spark, dgIp, corpus, "doc_id", "text", dgRpf)
    val tDgSeg = timed(DedupIndex.buildDigest(spark, dgSeg, batch,
      "doc_id", "text", dgRpf))
    val ipRows = batch.select(md5(col("text")).as("digest"),
      col("doc_id").cast("long").as("id"))
      .filter(col("digest").isNotNull)
      .select(DedupIndex.hkey60(col("digest")).as("hkey"),
        col("digest"), col("id"))
    val tDgIp = timed(new OrderedDataset(spark, dgIp).write(ipRows,
      WriteOpts("hkey", NRows(dgRpf),
        duplicatesOn = Some(Seq("digest", "id")))): Unit)

    // ---- and the amortized fold, for the record ----
    val tCompact = timed(DedupIndex.compactIndex(spark, bmSeg): Unit)
    val segsAfter = IndexSegments.liveParts(spark, bmSeg).size - 1

    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val line = s"""{"metric":"add_cost_ab","unit":"sec",""" +
      s""""cpus":$cpus,"corpus_docs":$nCorpus,"batch_docs":$nBatch,""" +
      s""""bm25_add_segment":${fmt(tBmSeg)},""" +
      s""""bm25_add_inplace":${fmt(tBmIp)},""" +
      s""""digest_add_segment":${fmt(tDgSeg)},""" +
      s""""digest_add_inplace":${fmt(tDgIp)},""" +
      s""""bm25_compact":${fmt(tCompact)},""" +
      s""""segments_after_compact":$segsAfter,"sf":"$sfDir"}"""
    println(line)
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
        line + "\n"): Unit
    }
    graft.LocalFs.rmTree(new java.io.File(root))
    spark.stop()
  }
}
