package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class Bm25IndexSpec extends SparkSpec {
  import spark.implicits._

  val corpus = Seq(
    (0L, "the quick brown fox"),
    (1L, "the lazy dog sleeps"),
    (2L, "the zebra runs fast"),
    (3L, "fox fox fox den"),
    (4L, "the quick quick brown brown fox fox and more and more words"),
    (5L, "another document about dogs and foxes"),
    (6L, "zebra zebra stripes"))
    .toDF("doc_id", "text")

  val queries = Seq((0L, "zebra fast"), (1L, "fox den"), (2L, "the dog"))
    .toDF("q_id", "q_text")

  private def rows(df: DataFrame) =
    df.orderBy("q_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSeq

  test("indexed topK is identical to the brute path") {
    val dir = tmpDir("bm25idx")
    Bm25Index.build(spark, dir, corpus, "doc_id", "text",
      rowsPerFile = 4)
    val brute = rows(RetrievalOps.bm25TopK(corpus, "doc_id", "text",
      queries, 5))
    val indexed = rows(Bm25Index.topK(spark, dir, queries, 5))
    assert(indexed == brute)
  }

  test("build + add equals a full build (scalars bumped under lock)") {
    val full = tmpDir("bm25full"); val inc = tmpDir("bm25inc")
    Bm25Index.build(spark, full, corpus, "doc_id", "text", 4)
    Bm25Index.build(spark, inc,
      corpus.filter($"doc_id" < 4), "doc_id", "text", 4)
    Bm25Index.add(spark, inc,
      corpus.filter($"doc_id" >= 4), "doc_id", "text", 4)
    assert(rows(Bm25Index.topK(spark, inc, queries, 5)) ==
      rows(Bm25Index.topK(spark, full, queries, 5)))
    val kv = new graft.store.OrderedDataset(spark, inc).kv
    assert(kv("graft.bm25.n_docs").toLong == 7L)
  }

  test("recountStats repairs tampered scalars from the postings") {
    val dir = tmpDir("bm25rec")
    Bm25Index.build(spark, dir, corpus, "doc_id", "text", 4)
    val ds = new graft.store.OrderedDataset(spark, dir)
    val good = ds.kv("graft.bm25.sum_dl")
    ds.updateKv(Map("graft.bm25.n_docs" -> "1",
      "graft.bm25.sum_dl" -> "1"))
    val (n, s) = Bm25Index.recountStats(spark, dir)
    assert(n == 7L && s.toString == good)
    assert(ds.kv("graft.bm25.n_docs") == "7")
  }

  test("concurrent adds compose their scalar bumps (locked RMW)") {
    val dir = tmpDir("bm25conc")
    Bm25Index.build(spark, dir,
      corpus.filter($"doc_id" < 3), "doc_id", "text", 4)
    // two adds race: each writes data, then bumps kv via transformKv;
    // the function form reads the CURRENT kv inside the lock, so both
    // increments must land regardless of interleaving
    val t1 = new Thread(() => Bm25Index.add(spark, dir,
      corpus.filter($"doc_id" === 3L || $"doc_id" === 4L),
      "doc_id", "text", 4))
    val t2 = new Thread(() => Bm25Index.add(spark, dir,
      corpus.filter($"doc_id" >= 5), "doc_id", "text", 4))
    t1.start(); t2.start(); t1.join(); t2.join()
    val kv = new graft.store.OrderedDataset(spark, dir).kv
    assert(kv("graft.bm25.n_docs").toLong == 7L)
    // and the index answers identically to a one-shot build
    val full = tmpDir("bm25conc_full")
    Bm25Index.build(spark, full, corpus, "doc_id", "text", 4)
    assert(rows(Bm25Index.topK(spark, dir, queries, 5)) ==
      rows(Bm25Index.topK(spark, full, queries, 5)))
  }

  test("missing scalars name their remedy instead of NoSuchElement") {
    val dir = tmpDir("bm25nokv")
    Bm25Index.build(spark, dir, corpus, "doc_id", "text", 4)
    new graft.store.OrderedDataset(spark, dir)
      .updateKv(Map.empty, remove = Seq("graft.bm25.n_docs"))
    val e = intercept[IllegalArgumentException] {
      Bm25Index.topK(spark, dir, queries, 5)
    }
    assert(e.getMessage.contains("recountStats"))
  }

  test("probing a foreign index kind fails loudly") {
    val dir = tmpDir("bm25kind")
    DedupIndex.buildDigest(spark, dir, corpus, "doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Bm25Index.topK(spark, dir, queries, 5)
    }
    assert(e.getMessage.contains("digest"))
  }
}
