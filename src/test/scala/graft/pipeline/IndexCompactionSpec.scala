package graft.pipeline

import graft.SparkSpec
import graft.store.OrderedDataset
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The LSM delta-segment lifecycle (VERDICT r11 #1): adds land as
  * fresh segments (O(increment) writes), probes union base + live
  * segments, compaction folds segments back atomically, and vacuum
  * reaps folded dirs past the grace window. Probe results must be
  * IDENTICAL at every stage.
  */
class IndexCompactionSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(lo: Long, hi: Long): DataFrame =
    (lo until hi).map { i =>
      (i, s"family ${i % 6} doc about topic ${i % 6} shared phrasing " +
        s"alpha beta gamma delta unique token u$i tail epsilon zeta")
    }.toDF("doc_id", "text")

  private def segDirs(dir: String): Seq[String] = {
    val d = new java.io.File(dir)
    if (!d.isDirectory) Nil
    else d.listFiles().filter(f => f.isDirectory &&
      f.getName.startsWith(IndexSegments.DeltaPrefix)).map(_.getName).toSeq
  }

  test("digest index: adds land as delta segments; the base is never " +
      "rewritten; compaction folds with identical probe results") {
    val dir = tmpDir("lsm_digest") + "/idx"
    DedupIndex.buildDigest(spark, dir, corpus(0L, 40L), "doc_id", "text",
      rowsPerFile = 10)
    val base = new OrderedDataset(spark, dir)
    val genAfterBuild = base.generation
    val baseFiles = base.meta.files.map(_.name).toSet
    // two increments -> two delta segments, base untouched (same
    // generation, same file list — the O(increment) write-path claim)
    DedupIndex.buildDigest(spark, dir, corpus(40L, 50L), "doc_id", "text",
      rowsPerFile = 10)
    DedupIndex.buildDigest(spark, dir, corpus(50L, 60L), "doc_id", "text",
      rowsPerFile = 10)
    assert(base.generation == genAfterBuild)
    assert(base.meta.files.map(_.name).toSet == baseFiles)
    assert(segDirs(dir).size == 2)
    // probe: copies of docs from base (3) and both segments (45, 55)
    val batch = corpus(0L, 60L).filter($"doc_id".isin(3L, 45L, 55L))
      .select(($"doc_id" + 1000L).as("doc_id"), $"text")
    def probe() = DedupIndex.probeDigest(spark, dir, batch,
        "doc_id", "text")
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    val before = probe()
    assert(before == Set((1003L, 3L), (1045L, 45L), (1055L, 55L)))
    // compact: fold both segments; probe unchanged; folded dirs still
    // on disk (reader grace) but EXCLUDED from the union
    assert(DedupIndex.compactIndex(spark, dir) == 2)
    assert(probe() == before)
    assert(segDirs(dir).size == 2) // on disk, awaiting vacuum
    assert(IndexSegments.liveParts(spark, dir).size == 1)
    // totals survived the fold exactly (no loss, no double count)
    assert(base.meta.totalRows == 60L)
    // idempotent: nothing live to fold
    assert(DedupIndex.compactIndex(spark, dir) == 0)
    // vacuum with a zero grace reaps the folded dirs
    assert(IndexSegments.vacuum(spark, dir, olderThanMs = -1L) == 2)
    assert(segDirs(dir).isEmpty)
    assert(probe() == before)
  }

  test("count index (span grams): occurrence totals sum across " +
      "segments and survive compaction exactly") {
    val dir = tmpDir("lsm_spans") + "/idx"
    val c1 = Seq((0L, "a b p q r s c"),
      (1L, "unrelated words entirely here now")).toDF("doc_id", "text")
    val c2 = Seq((2L, "m p q r s n zz yy xx ww")).toDF("doc_id", "text")
    val batch = Seq((10L, "k p q r s j")).toDF("doc_id", "text")
    // reference: everything in one build
    val fullDir = tmpDir("lsm_spans_full") + "/idx"
    DedupIndex.buildSpanGrams(spark, fullDir, c1.unionByName(c2),
      "doc_id", "text", k = 4, rowsPerFile = 100)
    def rows(d: String) = DedupIndex.dedupBatchSpans(spark, d, batch,
        "doc_id", "text", k = 4)
      .as[(Long, Long, Long, Long, String)].collect().toSet
    val expect = rows(fullDir)
    // incremental: base + tagged segment ('p q r s' spans both, so the
    // probe must SUM base + segment occurrences to reach minCount)
    DedupIndex.buildSpanGrams(spark, dir, c1, "doc_id", "text", k = 4,
      rowsPerFile = 100)
    DedupIndex.buildSpanGrams(spark, dir, c2, "doc_id", "text", k = 4,
      rowsPerFile = 100, incrementTag = Some("day2"))
    assert(segDirs(dir).size == 1)
    assert(rows(dir) == expect)
    // replay of the tagged increment is a no-op (stamp on the segment)
    DedupIndex.buildSpanGrams(spark, dir, c2, "doc_id", "text", k = 4,
      rowsPerFile = 100, incrementTag = Some("day2"))
    assert(segDirs(dir).size == 1)
    // compaction folds the counts (grouped SUM, not keep-last) and
    // moves the replay tag into the base's history
    assert(DedupIndex.compactIndex(spark, dir) == 1)
    assert(rows(dir) == expect)
    assert(IndexSegments.hasTag(spark, dir, "day2"))
    DedupIndex.buildSpanGrams(spark, dir, c2, "doc_id", "text", k = 4,
      rowsPerFile = 100, incrementTag = Some("day2")) // still a no-op
    assert(IndexSegments.liveParts(spark, dir).size == 1)
    assert(rows(dir) == expect)
  }

  test("bm25: segment adds + compaction answer identically to a " +
      "one-shot build, on both scan paths") {
    val all = corpus(0L, 30L)
    val queries = Seq((0L, "family topic alpha"), (1L, "u7 epsilon"))
      .toDF("q_id", "q_text")
    val fullDir = tmpDir("lsm_bm25_full") + "/idx"
    Bm25Index.build(spark, fullDir, all, "doc_id", "text", 8)
    def rows(d: String, mdk: Int = 65536) =
      Bm25Index.topK(spark, d, queries, 5, maxDriverKeys = mdk)
        .orderBy("q_id", "rank").collect().toSeq
    val expect = rows(fullDir)
    val dir = tmpDir("lsm_bm25") + "/idx"
    Bm25Index.build(spark, dir, all.filter($"doc_id" < 10L),
      "doc_id", "text", 8)
    Bm25Index.add(spark, dir, all.filter($"doc_id" >= 10L && $"doc_id" < 20L),
      "doc_id", "text", 8)
    Bm25Index.add(spark, dir, all.filter($"doc_id" >= 20L),
      "doc_id", "text", 8)
    assert(segDirs(dir).size == 2)
    assert(rows(dir) == expect)
    assert(rows(dir, mdk = 0) == expect) // over-cap full-union path
    assert(DedupIndex.compactIndex(spark, dir) == 2)
    assert(rows(dir) == expect)
    // scalars in the base kv survived the fold
    assert(new OrderedDataset(spark, dir).kv("graft.bm25.n_docs") == "30")
    // rebuilding over an existing index names the add remedy
    val e = intercept[IllegalArgumentException] {
      Bm25Index.build(spark, dir, all, "doc_id", "text", 8)
    }
    assert(e.getMessage.contains("Bm25Index.add"))
  }

  test("embedding two-level index: segment adds + compaction keep " +
      "probe results; the drift guard reads the UNION row count") {
    val dir = tmpDir("lsm_emb") + "/idx"
    def mkVecs(lo: Long, hi: Long) = SimilarityOps.withNorm(
      (lo until hi).map { i =>
        (i, Array.tabulate(8)(j => math.sin(i * 0.61 + j)))
      }.toDF("vec_id", "embedding"), "vec_id", "embedding")
    val planes = SimilarityOps.hyperplanes(8, 8)
    DedupIndex.buildEmbedding(spark, dir, mkVecs(0L, 60L), planes,
      planesPerBand = 2, rowsPerFile = 100)
    DedupIndex.buildEmbedding(spark, dir, mkVecs(60L, 100L), planes,
      planesPerBand = 2, rowsPerFile = 100)
    assert(segDirs(s"$dir/bands").size == 1)
    val batch = mkVecs(0L, 100L).filter($"id".isin(3L, 77L))
      .select(($"id" + 1000L).as("id"),
        transform($"vec", x => x * lit(2.0)).as("vec"),
        ($"norm" * 2.0).as("norm"))
    def probe() = DedupIndex.probeEmbedding(spark, dir, batch, planes,
        planesPerBand = 2, threshold = 0.99)
      .select("i", "j").as[(Long, Long)].collect().toSet
    val before = probe()
    assert(before.contains((3L, 1003L)) && before.contains((77L, 1077L)))
    // the occupancy guard sees base + segment rows: 100 vectors over
    // 2-bit bands = 25/bucket, so a 20-row cap must trip
    val e = intercept[IllegalArgumentException] {
      DedupIndex.probeEmbedding(spark, dir, batch, planes,
        planesPerBand = 2, threshold = 0.99,
        maxExpectedBucketRows = 20L)
    }
    assert(e.getMessage.contains("outgrown"))
    assert(DedupIndex.compactIndex(spark, dir) == 2) // bands + members
    assert(probe() == before)
  }

  test("ivf index: segment adds answer identically to a one-shot " +
      "build and survive compaction") {
    def mkVecs(lo: Long, hi: Long) = SimilarityOps.withNorm(
      (lo until hi).map { i =>
        (i, Array.tabulate(8)(j => math.cos(i * 0.37 + j)))
      }.toDF("vec_id", "embedding"), "vec_id", "embedding")
    val all = mkVecs(0L, 120L)
    val cents = all.filter($"id" % 10 === 0)
    val queries = all.filter($"id" < 3L)
    val fullDir = tmpDir("lsm_ivf_full") + "/idx"
    IvfIndex.buildWith(spark, fullDir, all, cents, rowsPerFile = 30)
    def rows(d: String) = IvfIndex.search(spark, d, queries, cents,
        nProbe = 3, k = 5)
      .orderBy("q_id", "rank").collect().toSeq
    val expect = rows(fullDir)
    val dir = tmpDir("lsm_ivf") + "/idx"
    IvfIndex.buildWith(spark, dir, all.filter($"id" < 80L), cents,
      rowsPerFile = 30)
    IvfIndex.add(spark, dir, all.filter($"id" >= 80L), cents,
      rowsPerFile = 30)
    assert(segDirs(dir).size == 1)
    assert(rows(dir) == expect)
    assert(DedupIndex.compactIndex(spark, dir) == 1)
    assert(rows(dir) == expect)
    assert(IndexSegments.liveParts(spark, dir).size == 1)
  }

  test("contamination index: per-segment blooms OR together; " +
      "compaction folds and re-derives the base bloom; " +
      "compactIndexIfNeeded respects its threshold") {
    val train = (0L until 40L).map(i =>
      (i, s"train doc $i words w${i % 7} w${i % 11} filler f$i g$i h$i"))
      .toDF("doc_id", "text")
    val evalA = Seq((900L, "train doc 3 words w3 w3")).toDF("doc_id", "text")
    val evalB = Seq((901L, "doc 7 words w0 too here")).toDF("doc_id", "text")
    val dir = tmpDir("lsm_contam") + "/idx"
    ContaminationOps.buildIndex(spark, dir, evalA, "doc_id", "text", 3,
      rowsPerFile = 50)
    ContaminationOps.buildIndex(spark, dir, evalB, "doc_id", "text", 3,
      rowsPerFile = 50)
    assert(segDirs(dir).size == 1)
    // the delta segment carries its own bloom blob
    assert(new java.io.File(segDirs(dir).map(n => s"$dir/$n").head,
      "_bloom").exists())
    def probe() = ContaminationOps
      .probeIndex(spark, dir, train, "doc_id", "text", 3)
      .as[(Long, Long)].collect().toMap
    val expect = ContaminationOps
      .overlap(train, evalA.unionByName(evalB), "doc_id", "text", 3)
      .as[(Long, Long)].collect().toMap
    assert(probe() == expect)
    // under threshold: no fold; at threshold: fold + bloom rebuild
    assert(DedupIndex.compactIndexIfNeeded(spark, dir,
      maxSegments = 2) == 0)
    assert(DedupIndex.compactIndexIfNeeded(spark, dir,
      maxSegments = 1) == 1)
    assert(IndexSegments.liveParts(spark, dir).size == 1)
    assert(probe() == expect)
    // the folded base's bloom covers BOTH drops' grams (gen tag matches
    // the folded row count, so the prefilter is active and still exact)
    val base = new graft.store.OrderedDataset(spark, dir)
    assert(base.kv("graft.contam.bloomrows") ==
      base.meta.totalRows.toString)
  }

  test("concurrent tagged increments write disjoint segments and " +
      "compose (the r11 lost-update window is structural history)") {
    val dir = tmpDir("lsm_conc") + "/idx"
    val c0 = Seq((0L, "base words only here")).toDF("doc_id", "text")
    DedupIndex.buildSpanGrams(spark, dir, c0, "doc_id", "text", k = 4,
      rowsPerFile = 100)
    val inc1 = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val inc2 = Seq((2L, "a b c d x y")).toDF("doc_id", "text")
    val t1 = new Thread(() => DedupIndex.buildSpanGrams(spark, dir, inc1,
      "doc_id", "text", k = 4, rowsPerFile = 100,
      incrementTag = Some("e1")))
    val t2 = new Thread(() => DedupIndex.buildSpanGrams(spark, dir, inc2,
      "doc_id", "text", k = 4, rowsPerFile = 100,
      incrementTag = Some("e2")))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert(segDirs(dir).size == 2)
    // 'a b c d' occurs once in EACH increment — only the union view
    // reaches minCount 2: a lost update would leave it at 1
    val batch = Seq((10L, "z a b c d w")).toDF("doc_id", "text")
    val got = DedupIndex.dedupBatchSpans(spark, dir, batch,
        "doc_id", "text", k = 4, includeBatchCnt = false)
      .as[(Long, Long, Long, Long, String)].collect().head
    assert(got._3 == 4L, s"expected the shared gram covered, got $got")
  }
}
