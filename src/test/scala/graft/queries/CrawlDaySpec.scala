package graft.queries

import graft.SparkSpec
import graft.pipeline.{Bm25Index, ContaminationOps, DedupIndex,
  IndexSegments, RetrievalOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed daily-crawl-day loop (VERDICT r12 #7): beyond the
  * p_crawl_day oracle (which gates the loop through the post-add BM25
  * rankings), assert the STATE claim directly — after probe →
  * decontaminate → dedup → segment adds, every index equals a
  * one-shot build over corpus ∪ survivors, where the survivors are
  * recomputed here WITHOUT any index (brute overlap + brute digest
  * joins), so the two sides share no code path.
  */
class CrawlDaySpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("after the crawl day, index state equals a one-shot build over " +
      "corpus ∪ independently-recomputed survivors") {
    val root = PipelineQueries.ensureCrawlDay(spark, sfDir)
    val (corpus, crawl, eval) = PipelineQueries.crawlDaySplits(spark, sfDir)

    // survivors, index-free: brute gram overlap + brute digest joins
    val contaminated = ContaminationOps.overlap(crawl, eval,
      "doc_id", "text", 5).select(col("id").as("doc_id"))
    val clean = crawl.join(contaminated, Seq("doc_id"), "left_anti")
    val corpusDg = corpus.select(md5(col("text")).as("dg")).distinct()
    val survivors = clean
      .join(corpusDg, md5(col("text")) === col("dg"), "left_anti")
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
      .filter(col("__rn") === 1).drop("__rn")
      .persist()
    try {
      val nSurv = survivors.count()
      val nCrawl = crawl.count()
      assert(nSurv > 0 && nSurv < nCrawl,
        s"fixture degenerate: $nSurv survivors of $nCrawl crawled")
      val world = corpus.unionByName(survivors)

      // one-shot references
      val oneShot = tmpDir("crawl_ref")
      Bm25Index.build(spark, s"$oneShot/bm25", world, "doc_id", "text",
        2000L)
      DedupIndex.buildDigest(spark, s"$oneShot/digest", world,
        "doc_id", "text", rowsPerFile = 2000L)

      // BM25: scalars AND rankings equal (scalars prove the locked kv
      // bumps composed; rankings prove the postings did)
      val dayKv = IndexSegments
        .liveParts(spark, s"$root/bm25").head.m.kv
      val refKv = IndexSegments
        .liveParts(spark, s"$oneShot/bm25").head.m.kv
      assert(dayKv("graft.bm25.n_docs") == refKv("graft.bm25.n_docs"))
      assert(dayKv("graft.bm25.sum_dl") == refKv("graft.bm25.sum_dl"))
      val q = Seq((0L, "fast table scan"), (1L, "stream window agg"),
        (2L, "vector filter group join")).toDF("q_id", "q_text")
      def rank(d: String, mdk: Int = 65536) =
        Bm25Index.topK(spark, d, q, 10, RetrievalOps.K1, RetrievalOps.B,
          mdk).orderBy("q_id", "rank").collect().toSeq
      assert(rank(s"$root/bm25") == rank(s"$oneShot/bm25"))
      // the over-cap zone-pruned tier answers identically too
      assert(rank(s"$root/bm25", mdk = 0) == rank(s"$oneShot/bm25"))

      // digest index: probing tomorrow's re-crawl of TODAY'S survivors
      // must catch them all — the add really extended the index
      val tomorrow = survivors.select(
        (col("doc_id") + 7000000000L).as("doc_id"), col("text"))
      val caught = DedupIndex.probeDigest(spark, s"$root/digest",
          tomorrow, "doc_id", "text")
        .select("new_id").distinct().count()
      assert(caught == nSurv,
        s"post-add digest index caught $caught of $nSurv re-crawls")
      // and equals the one-shot digest probe row-for-row
      def dgProbe(d: String): Set[(Long, Long)] =
        DedupIndex.probeDigest(spark, d, tomorrow, "doc_id", "text")
          .select("new_id", "corpus_id").as[(Long, Long)]
          .collect().toSet
      assert(dgProbe(s"$root/digest") == dgProbe(s"$oneShot/digest"))
    } finally survivors.unpersist(): Unit
  }

  test("the day's plan is PINNED end to end: a compaction AND a new " +
      "index add landing after plan construction change nothing; a " +
      "fresh plan sees the add") {
    val root = tmpDir("crawl_pin")
    def mk(ids: Seq[Long], tag: String) = ids.map(i =>
      (i, s"$tag doc $i alpha beta gamma delta u$i epsilon zeta"))
      .toDF("doc_id", "text")
    val eval = mk(900L to 903L, "evalset")
    val corpus = mk(0L until 20L, "corpus")
    // crawl: 10 fresh docs + 2 exact re-crawls of corpus + 1 eval-
    // contaminated doc (shares a ContamN-gram window with eval text)
    val crawl = mk(100L until 110L, "fresh")
      .unionByName(mk(Seq(3L, 7L), "corpus")
        .select(($"doc_id" + 500L).as("doc_id"), $"text"))
      .unionByName(Seq((300L,
        "evalset doc 900 alpha beta gamma delta u900 epsilon"))
        .toDF("doc_id", "text"))
    ContaminationOps.buildIndex(spark, s"$root/contam", eval,
      "doc_id", "text", PipelineQueries.ContamN, rowsPerFile = 500L)
    // digest in TWO increments so the compaction genuinely folds
    DedupIndex.buildDigest(spark, s"$root/digest",
      corpus.filter($"doc_id" < 10L), "doc_id", "text",
      rowsPerFile = 500L)
    DedupIndex.buildDigest(spark, s"$root/digest",
      corpus.filter($"doc_id" >= 10L), "doc_id", "text",
      rowsPerFile = 500L)
    def ids(df: DataFrame): Set[Long] =
      df.select("doc_id").as[Long].collect().toSet
    val expected = ids(
      PipelineQueries.crawlDaySurvive(spark, root, crawl))
    assert(expected == ((100L until 110L).toSet),
      s"fixture sanity: re-crawls and the contaminated doc drop, got " +
        s"$expected")
    // build the pinned plan, THEN mutate both indexes: fold + a new
    // add that would flag doc 105 as a duplicate if it were visible
    val pinned = PipelineQueries.crawlDaySurvive(spark, root, crawl)
    assert(DedupIndex.compactIndex(spark, s"$root/digest") >= 1)
    assert(DedupIndex.compactIndex(spark, s"$root/contam") >= 0)
    DedupIndex.buildDigest(spark, s"$root/digest",
      mk(Seq(105L), "fresh").select(($"doc_id" + 700L).as("doc_id"),
        $"text"), "doc_id", "text", rowsPerFile = 500L)
    assert(ids(pinned) == expected,
      "a pinned day must not see post-capture folds or adds")
    // a FRESH plan captures the new state: 105 now deduplicates away
    assert(ids(PipelineQueries.crawlDaySurvive(spark, root, crawl)) ==
      expected - 105L)
  }
}
