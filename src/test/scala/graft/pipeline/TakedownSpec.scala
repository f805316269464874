package graft.pipeline

import graft.SparkSpec
import graft.store.OrderedDataset
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document takedown across the index family (r13): a corpus purge
  * (`OrderedDataset.delete`) without the index side would keep
  * SERVING the purged ids — `DedupIndex.removeDocs` closes that gap
  * with LSM tombstones: O(id list) writes, immediate probe masking,
  * physical purge at the next compaction, re-adds after the removal
  * visible again.
  */
class TakedownSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(lo: Long, hi: Long): DataFrame =
    (lo until hi).map(i =>
      (i, s"takedown doc $i topic t${i % 4} words w${i % 7} tail u$i"))
      .toDF("doc_id", "text")

  private def tombDirs(dir: String): Seq[String] = {
    val d = new java.io.File(dir)
    if (!d.isDirectory) Nil
    else d.listFiles().filter(f => f.isDirectory && f.getName
      .startsWith(IndexSegments.TombstonePrefix)).map(_.getName).toSeq
  }

  test("digest: removed ids vanish from probes immediately (base AND " +
      "segment hits), a later re-add is visible, compaction purges " +
      "physically, vacuum reaps and prunes the ledger") {
    val dir = tmpDir("td_digest") + "/idx"
    DedupIndex.buildDigest(spark, dir, corpus(0L, 30L), "doc_id", "text",
      rowsPerFile = 10)
    DedupIndex.buildDigest(spark, dir, corpus(30L, 40L), "doc_id", "text",
      rowsPerFile = 10)
    def probe(ids: Long*) = DedupIndex.probeDigest(spark, dir,
        corpus(0L, 40L).filter($"doc_id".isin(ids.map(Long.box): _*))
          .select(($"doc_id" + 1000L).as("doc_id"), $"text"),
        "doc_id", "text")
      .select("corpus_id").as[Long].collect().toSet
    assert(probe(5L, 35L, 7L) == Set(5L, 35L, 7L))
    // take down one base doc and one segment doc
    assert(DedupIndex.removeDocs(spark, dir,
      Seq(5L, 35L).toDF("doc_id")) == 1)
    assert(probe(5L, 35L, 7L) == Set(7L),
      "removed ids must vanish from probes before any compaction")
    // over-cap (zone-pruned) path masks them too
    assert(DedupIndex.probeDigest(spark, dir,
        corpus(0L, 40L).filter($"doc_id".isin(5L, 35L, 7L))
          .select(($"doc_id" + 1000L).as("doc_id"), $"text"),
        "doc_id", "text", maxDriverKeys = 0)
      .select("corpus_id").as[Long].collect().toSet == Set(7L))
    // a RE-ADD after the removal is visible again — the causal rule
    // (TombSeenKey) makes even a same-millisecond re-add safe, so no
    // clock-separating sleep is needed (r14)
    DedupIndex.buildDigest(spark, dir, corpus(5L, 6L), "doc_id", "text",
      rowsPerFile = 10)
    assert(probe(5L, 35L, 7L) == Set(5L, 7L))
    // compaction applies the purge physically; probes unchanged
    val rowsBefore = IndexSegments.liveParts(spark, dir)
      .map(_.m.totalRows).sum
    assert(DedupIndex.compactIndex(spark, dir) >= 1)
    assert(probe(5L, 35L, 7L) == Set(5L, 7L))
    val base = new OrderedDataset(spark, dir)
    assert(base.meta.totalRows == rowsBefore - 2,
      "the fold must physically drop the two tombstoned rows")
    assert(base.kv.contains(IndexSegments.TombAppliedKey))
    // vacuum reaps the applied tombstone dir and prunes BOTH ledger
    // keys (a lingering listed entry would resurrect a ghost)
    assert(tombDirs(dir).size == 1)
    assert(IndexSegments.vacuum(spark, dir, olderThanMs = -1L) >= 1)
    assert(tombDirs(dir).isEmpty)
    val kv = new OrderedDataset(spark, dir).kv
    assert(!kv.contains(IndexSegments.TombstoneKey) &&
      !kv.contains(IndexSegments.TombAppliedKey))
    assert(probe(5L, 35L, 7L) == Set(5L, 7L))
  }

  test("bm25: remove == rebuild without the docs (scalars AND " +
      "rankings), before and after compaction") {
    val all = corpus(0L, 30L)
    val removed = Seq(3L, 11L, 17L)
    val dir = tmpDir("td_bm25") + "/idx"
    Bm25Index.build(spark, dir, all, "doc_id", "text", 8)
    Bm25Index.remove(spark, dir, removed.toDF("doc_id"))
    val refDir = tmpDir("td_bm25_ref") + "/idx"
    Bm25Index.build(spark, refDir,
      all.filter(!$"doc_id".isin(removed.map(Long.box): _*)),
      "doc_id", "text", 8)
    val q = Seq((0L, "topic t3 words w3"), (1L, "tail u11"))
      .toDF("q_id", "q_text")
    def rank(d: String) = Bm25Index.topK(spark, d, q, 10)
      .orderBy("q_id", "rank").collect().toSeq
    def scalars(d: String) = {
      val kv = new OrderedDataset(spark, d).kv
      (kv("graft.bm25.n_docs"), kv("graft.bm25.sum_dl"))
    }
    assert(scalars(dir) == scalars(refDir))
    assert(rank(dir) == rank(refDir))
    assert(DedupIndex.compactIndex(spark, dir) >= 0)
    assert(rank(dir) == rank(refDir))
    // recountStats reads tombstone-filtered truth (the repair path)
    assert(Bm25Index.recountStats(spark, dir) ==
      (scalars(refDir)._1.toLong, scalars(refDir)._2.toLong))
  }

  test("ivf + embedding + simhash: removed ids vanish from searches " +
      "and near-dup probes; count kinds reject with the rebuild remedy") {
    // ivf
    def mkVecs(lo: Long, hi: Long) = SimilarityOps.withNorm(
      (lo until hi).map { i =>
        (i, Array.tabulate(8)(j => math.cos(i * 0.37 + j)))
      }.toDF("vec_id", "embedding"), "vec_id", "embedding")
    val vecs = mkVecs(0L, 60L)
    val cents = vecs.filter($"id" % 10 === 0)
    val ivfDir = tmpDir("td_ivf") + "/idx"
    IvfIndex.buildWith(spark, ivfDir, vecs, cents, rowsPerFile = 20)
    val queries = vecs.filter($"id" < 2L)
    def hits() = IvfIndex.search(spark, ivfDir, queries, cents,
      nProbe = 6, k = 60).select("vec_id").as[Long].collect().toSet
    val id0 = hits().head
    assert(DedupIndex.removeDocs(spark, ivfDir,
      Seq(id0).toDF("id")) == 1)
    assert(!hits().contains(id0))
    // embedding two-level: both sub-datasets tombstoned
    val embDir = tmpDir("td_emb") + "/idx"
    val planes = SimilarityOps.hyperplanes(8, 8)
    DedupIndex.buildEmbedding(spark, embDir, mkVecs(0L, 40L), planes,
      planesPerBand = 2, rowsPerFile = 100)
    val batch = mkVecs(0L, 40L).filter($"id".isin(3L, 7L))
      .select(($"id" + 1000L).as("id"), $"vec", $"norm")
    def pairs() = DedupIndex.probeEmbedding(spark, embDir, batch, planes,
        planesPerBand = 2, threshold = 0.99)
      .select("i").as[Long].collect().toSet
    val before = pairs()
    assert(before.contains(3L) && before.contains(7L))
    assert(DedupIndex.removeDocs(spark, embDir, Seq(3L).toDF("id")) == 2)
    assert(pairs() == before - 3L)
    // simhash: members-side tombstone
    val simDir = tmpDir("td_sim") + "/idx"
    val simDocs = corpus(0L, 20L)
      .unionByName(Seq((100L, "takedown doc 4 topic t0 words w4 tail u4"))
        .toDF("doc_id", "text")) // near-exact twin of doc 4
    DedupIndex.buildSimhash(spark, simDir, simDocs, "doc_id", "text",
      rowsPerFile = 100)
    def simPairs() = DedupIndex.probeSimhash(spark, simDir,
        Seq((200L, "takedown doc 4 topic t0 words w4 tail u4"))
          .toDF("doc_id", "text"), "doc_id", "text", maxDist = 3)
      .select("i").as[Long].collect().toSet
    assert(simPairs().contains(100L))
    assert(DedupIndex.removeDocs(spark, simDir,
      Seq(100L).toDF("id")) == 1)
    assert(!simPairs().contains(100L))
    // count kinds: id-only removeDocs rejects, naming BOTH remedies
    val spanDir = tmpDir("td_spans") + "/idx"
    DedupIndex.buildSpanGrams(spark, spanDir, corpus(0L, 5L),
      "doc_id", "text", k = 4, rowsPerFile = 100)
    val e = intercept[IllegalArgumentException] {
      DedupIndex.removeDocs(spark, spanDir, Seq(1L).toDF("id"))
    }
    assert(e.getMessage.contains("rebuild") &&
      e.getMessage.contains("removeCountedDocs"))
  }

  test("count kinds: decrement-segment takedown equals an index " +
      "built without the docs — live (summed) before compaction, " +
      "physically purged after; a double remove degrades to absent, " +
      "never suppressing a batch's own counts") {
    def spanDocs(ids: Seq[Long]) = ids.map(i =>
      (i, s"shared lead p q r s t u tail c$i extra words here"))
      .toDF("doc_id", "text")
    val all = 0L until 20L
    val removed = Seq(3L, 8L, 15L)
    val keep = all.filterNot(removed.contains)
    val dir = tmpDir("td_spans_dec") + "/idx"
    val refDir = tmpDir("td_spans_decref") + "/idx"
    DedupIndex.buildSpanGrams(spark, dir, spanDocs(all), "doc_id",
      "text", k = 4, rowsPerFile = 50)
    DedupIndex.buildSpanGrams(spark, refDir, spanDocs(keep), "doc_id",
      "text", k = 4, rowsPerFile = 50)
    // cost ∝ removed docs: their grams land as ONE negative segment
    DedupIndex.removeCountedDocs(spark, dir, spanDocs(removed),
      "doc_id", "text")
    val probeBatch = Seq((100L, "z p q r s t u w"),
      (101L, "alone c8 extra words here now")).toDF("doc_id", "text")
    def spans(d: String) = DedupIndex.dedupBatchSpans(spark, d,
        probeBatch, "doc_id", "text", k = 4)
      .as[(Long, Long, Long, Long, String)].collect().toSet
    assert(spans(dir) == spans(refDir),
      "live decrement sum must answer like the without-docs build")
    // the fold physically purges: base rows == the reference build's
    assert(DedupIndex.compactIndex(spark, dir) >= 1)
    assert(spans(dir) == spans(refDir))
    def rows(d: String) = IndexSegments
      .unionDf(IndexSegments.liveParts(spark, d))
      .select("hkey", "gd", "cnt").as[(Long, String, Long)]
      .collect().toSet
    assert(rows(dir) == rows(refDir),
      "post-fold totals must equal an index that never saw the docs")
    // segments kind: same decrement story through one add/remove/fold
    val segDir = tmpDir("td_seg_dec") + "/idx"
    val segRef = tmpDir("td_seg_decref") + "/idx"
    def segDocs(ids: Seq[Long]) = ids.map(i =>
      (i, ("common boiler plate sentence here again and again also " +
        s"unique u$i piece")))
      .toDF("doc_id", "text")
    DedupIndex.buildSegments(spark, segDir, segDocs(all), "doc_id",
      "text", segWords = 5, rowsPerFile = 50)
    DedupIndex.buildSegments(spark, segRef, segDocs(keep), "doc_id",
      "text", segWords = 5, rowsPerFile = 50)
    DedupIndex.removeCountedDocs(spark, segDir, segDocs(removed),
      "doc_id", "text")
    def segs(d: String) = DedupIndex.dedupBatchSegments(spark, d,
        segDocs(Seq(200L, 201L)), "doc_id", "text", segWords = 5)
      .collect().toSeq.map(_.toString).toSet
    assert(segs(segDir) == segs(segRef))
    assert(DedupIndex.compactIndex(spark, segDir) >= 1)
    assert(segs(segDir) == segs(segRef))
    // OUT-OF-CONTRACT double remove: totals go negative, the probe
    // clamp turns them into "absent" — a batch whose OWN repetition
    // crosses minCount must still be flagged (an unclamped sum would
    // cancel the batch's own counts and under-strip)
    DedupIndex.removeCountedDocs(spark, dir, spanDocs(removed),
      "doc_id", "text")
    val selfDup = Seq((300L, "shared lead p q r s t u " +
      "shared lead p q r s t u end")).toDF("doc_id", "text")
    val flagged = DedupIndex.dedupBatchSpans(spark, dir, selfDup,
        "doc_id", "text", k = 4)
      .as[(Long, Long, Long, Long, String)].collect().head
    assert(flagged._3 > 0L,
      s"batch-internal duplicate spans must stay flagged after a " +
        s"double remove, got $flagged")
  }
}
