package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generation-pinned index reads (VERDICT r12 #8): a capture taken
  * with [[DedupIndex.pinIndex]] answers every probe from ONE index
  * version, even while concurrent adds land segments and a compaction
  * folds + rewrites the base underneath it — the store's `dfAsOf`
  * discipline lifted to the base∪segments union.
  */
class PinnedIndexSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(lo: Long, hi: Long): DataFrame =
    (lo until hi).map(i =>
      (i, s"pinned doc $i topic t${i % 4} words w${i % 7} tail u$i"))
      .toDF("doc_id", "text")

  test("digest probes from one pin are version-stable across a " +
      "concurrent add + compaction; a fresh capture sees the add") {
    val dir = tmpDir("pin_digest") + "/idx"
    DedupIndex.buildDigest(spark, dir, corpus(0L, 30L), "doc_id", "text",
      rowsPerFile = 10)
    val pin = DedupIndex.pinIndex(spark, dir, "digest")
    def keyed(ids: Long*) = corpus(0L, 60L)
      .filter($"doc_id".isin(ids.map(Long.box): _*))
      .select(($"doc_id" + 1000L).as("new_id"), md5($"text").as("digest"))
    def probePinned(ids: Long*) =
      DedupIndex.probeDigestKeyed(pin, keyed(ids: _*), 65536)
        .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(probePinned(3L, 45L) == Set((1003L, 3L)))
    // the world moves: an add lands a segment, a compaction folds it
    // and rewrites the base, tags included
    DedupIndex.buildDigest(spark, dir, corpus(30L, 60L), "doc_id", "text",
      rowsPerFile = 10)
    assert(DedupIndex.compactIndex(spark, dir) == 1)
    // the pin still answers from ITS version: doc 45 is invisible,
    // doc 3 still resolves through the RETIRED base files
    assert(probePinned(3L, 45L) == Set((1003L, 3L)))
    assert(IndexSegments.totalRows(pin) == 30L)
    // a fresh capture sees the post-fold world
    val fresh = DedupIndex.pinIndex(spark, dir, "digest")
    assert(DedupIndex.probeDigestKeyed(fresh, keyed(3L, 45L), 65536)
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet ==
      Set((1003L, 3L), (1045L, 45L)))
    assert(IndexSegments.totalRows(fresh) == 60L)
  }

  test("bm25 topK from one pin scores against one index version " +
      "(postings AND corpus scalars); hasTagIn pins the tag view too") {
    val dir = tmpDir("pin_bm25") + "/idx"
    Bm25Index.build(spark, dir, corpus(0L, 20L), "doc_id", "text", 8)
    val pin = DedupIndex.pinIndex(spark, dir, Bm25Index.Kind)
    val q = Seq((0L, "topic t1 words")).toDF("q_id", "q_text")
    val before = Bm25Index.topK(pin, q, 5, RetrievalOps.K1,
      RetrievalOps.B, 65536).collect().toSeq
    // an add changes the scalars (N, Σdl) and lands new postings
    Bm25Index.add(spark, dir, corpus(20L, 40L), "doc_id", "text", 8)
    assert(Bm25Index.topK(pin, q, 5, RetrievalOps.K1,
      RetrievalOps.B, 65536).collect().toSeq == before,
      "pinned scores must not move under a concurrent add")
    assert(Bm25Index.topK(spark, dir, q, 5).collect().toSeq != before,
      "a fresh read must see the add (scalars + postings)")
    // tag views pin the same way
    val spanDir = tmpDir("pin_tags") + "/idx"
    DedupIndex.buildSpanGrams(spark, spanDir, corpus(0L, 5L),
      "doc_id", "text", k = 4, rowsPerFile = 100)
    val tagPin = IndexSegments.liveParts(spark, spanDir)
    DedupIndex.buildSpanGrams(spark, spanDir, corpus(5L, 10L),
      "doc_id", "text", k = 4, rowsPerFile = 100,
      incrementTag = Some("day9"))
    assert(!IndexSegments.hasTagIn(tagPin, "day9"))
    assert(IndexSegments.hasTag(spark, spanDir, "day9"))
  }
}
