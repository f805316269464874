package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalOpsSpec extends SparkSpec {
  import spark.implicits._

  // 'zebra' is rare (one doc); 'the' is everywhere; doc 3 repeats
  // 'fox' (tf weighting) and doc 4 is long (length normalization).
  val corpus = Seq(
    (0L, "the quick brown fox"),
    (1L, "the lazy dog sleeps"),
    (2L, "the zebra runs fast"),
    (3L, "fox fox fox den"),
    (4L, "the quick quick brown brown fox fox and more and more words"))
    .toDF("doc_id", "text")

  test("bm25: rare term beats common term; all terms hit counted") {
    val q = Seq((0L, "zebra"), (1L, "the zebra")).toDF("q_id", "q_text")
    val out = RetrievalOps.bm25TopK(corpus, "doc_id", "text", q, 5)
      .collect().groupBy(_.getLong(0))
    // q0: only doc 2 contains zebra
    val q0 = out(0L).sortBy(_.getInt(1))
    assert(q0.head.getLong(2) == 2L && q0.length == 1)
    // q1: doc 2 matches both terms (n_hit 2) and outranks every
    // the-only doc; 'the' alone never outranks the zebra doc
    val q1 = out(1L).sortBy(_.getInt(1))
    assert(q1.head.getLong(2) == 2L && q1.head.getLong(4) == 2L)
    assert(q1.tail.forall(_.getLong(4) == 1L))
  }

  test("bm25: score matches the quantized closed form") {
    val q = Seq((0L, "zebra")).toDF("q_id", "q_text")
    val got = RetrievalOps.bm25TopK(corpus, "doc_id", "text", q, 1)
      .select("score").as[Double].head()
    // replay the exact arithmetic: N=5 docs, df(zebra)=1, doc 2 has
    // tf=1, dl=4, avgdl=(4+4+4+4+12)/5
    val n = 5.0; val df = 1.0; val tf = 1.0; val dl = 4.0
    val avgdl = 28.0 / 5.0
    val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    val wt = tf * (RetrievalOps.K1 + 1.0) /
      (tf + RetrievalOps.K1 * ((1.0 - RetrievalOps.B) +
        RetrievalOps.B * dl / avgdl))
    val want = math.rint(1e6 * idf * wt) / 1e6
    assert(math.abs(got - want) < 5e-7, s"got $got want $want")
  }

  test("bm25: tf repetition saturates, never dominates a second term") {
    val q = Seq((0L, "fox den")).toDF("q_id", "q_text")
    val top = RetrievalOps.bm25TopK(corpus, "doc_id", "text", q, 1)
      .collect().head
    // doc 3 matches both terms AND has the tf advantage
    assert(top.getLong(2) == 3L && top.getLong(4) == 2L)
  }

  test("rrf: both-arm documents outrank single-arm rank-1s; exact sum") {
    val armA = Seq((0L, 10L, 1), (0L, 11L, 2)).toDF("q_id", "doc_id", "rank")
    val armB = Seq((0L, 11L, 1), (0L, 12L, 2)).toDF("q_id", "doc_id", "rank")
    val out = RetrievalOps.rrfFuse(armA, armB, 3).collect()
      .sortBy(_.getInt(1))
    assert(out.map(_.getLong(2)).toSeq == Seq(11L, 10L, 12L))
    val c1 = math.rint(1e9 / 61).toLong; val c2 = math.rint(1e9 / 62).toLong
    assert(out.head.getLong(3) == c1 + c2) // doc 11: rank 2 in A, 1 in B
    assert(out(1).getLong(3) == c1)        // doc 10: rank 1 in A only
  }

  test("rrf: equal scores tie-break by ascending doc id") {
    val armA = Seq((0L, 20L, 1), (0L, 7L, 1)).toDF("q_id", "doc_id", "rank")
      .filter($"doc_id" === 20L)
    val armB = Seq((0L, 7L, 1)).toDF("q_id", "doc_id", "rank")
    val out = RetrievalOps.rrfFuse(armA, armB, 2).collect()
      .sortBy(_.getInt(1))
    assert(out.map(_.getLong(2)).toSeq == Seq(7L, 20L))
  }
}
