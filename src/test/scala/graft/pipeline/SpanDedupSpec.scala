package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.security.MessageDigest

class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private def md5s(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def run(docs: Seq[(Long, String)], k: Int = 4) =
    DedupOps.spanDedup(docs.toDF("doc_id", "text"), "doc_id", "text", k)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap

  test("cross-doc duplicated k-gram covered at any alignment") {
    // the shared run 'p q r s' sits at DIFFERENT offsets in each doc —
    // segment-style disjoint blocks would miss one of them
    val out = run(Seq(
      (0L, "a b p q r s c d"),
      (1L, "x p q r s y z w"),
      (2L, "m n o u v w1 w2 w3")))
    assert(out(0L) == ((8L, 4L, 1L, md5s("a b c d"))))
    assert(out(1L) == ((8L, 4L, 1L, md5s("x y z w"))))
    assert(out(2L)._2 == 0L && out(2L)._3 == 0L &&
      out(2L)._4 == md5s("m n o u v w1 w2 w3"))
  }

  test("overlapping duplicate windows merge into one maximal span") {
    // 'p q r s t' duplicated: windows at pos 1 and 2 overlap → one
    // span of 5 tokens, not two of 4
    val out = run(Seq(
      (0L, "a p q r s t b"),
      (1L, "c p q r s t d")))
    assert(out(0L) == ((7L, 5L, 1L, md5s("a b"))))
  }

  test("global-occurrence counting: a within-doc repeat is removed") {
    // 'p q r s' appears twice in ONE doc (nowhere else): global
    // count 2 ≥ minCount — segmentDedup's distinct-doc rule keeps it
    val out = run(Seq(
      (0L, "p q r s z p q r s"),
      (1L, "entirely different words here okay")))
    assert(out(0L)._2 == 8L && out(0L)._3 == 2L &&
      out(0L)._4 == md5s("z"))
    assert(out(1L)._2 == 0L)
  }

  test("adjacent spans (delta == k) fuse; delta > k splits") {
    // doc 0: duplicated windows at pos 1 and pos 5 (delta 4 == k) →
    // contiguous coverage 1..8 → ONE span of 8
    val out = run(Seq(
      (0L, "a p q r s t u v w b"),
      (1L, "p q r s x1 x2 y1 y2"),
      (2L, "t u v w x3 x4 y3 y4")))
    assert(out(0L)._2 == 8L && out(0L)._3 == 1L)
    // doc 1/2: one 4-token span each, the rest kept
    assert(out(1L) == ((8L, 4L, 1L, md5s("x1 x2 y1 y2"))))
  }

  test("textOut emits the rewritten text itself (the ingest path)") {
    val docs = Seq((0L, "a p q r s b"), (1L, "c p q r s d"))
      .toDF("doc_id", "text")
    val out = DedupOps.spanDedup(docs, "doc_id", "text", 4,
        textOut = true)
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(out(0L) == "a b" && out(1L) == "c d")
  }

  test("fully covered doc digests empty; short docs pass through") {
    val out = run(Seq(
      (0L, "p q r s"),
      (1L, "p q r s"),
      (2L, "t u")))          // shorter than k: no grams at all
    assert(out(0L) == ((4L, 4L, 1L, md5s(""))))
    assert(out(2L) == ((2L, 0L, 0L, md5s("t u"))))
  }
}
