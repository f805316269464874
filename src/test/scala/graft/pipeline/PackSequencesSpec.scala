package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.security.MessageDigest

class PackSequencesSpec extends SparkSpec {
  import spark.implicits._

  private def md5s(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("one shard: concat in id order, cut at seqLen, partial tail") {
    val docs = Seq((0L, "a b c"), (1L, "d e"), (2L, "f g h i j"))
      .toDF("doc_id", "text")
    val out = PackOps.packSequences(docs, "doc_id",
        split(col("text"), " "), shards = 1, seqLen = 4)
      .orderBy("seq_id").collect()
    // stream: a b c | d e | f g h i j → [a b c d][e f g h][i j]
    assert(out.map(_.getAs[Long]("n_tokens")).toSeq == Seq(4L, 4L, 2L))
    assert(out.map(_.getAs[Long]("n_docs")).toSeq == Seq(2L, 2L, 1L))
    assert(out(0).getAs[String]("tokens_digest") == md5s("a|b|c|d"))
    assert(out(1).getAs[String]("tokens_digest") == md5s("e|f|g|h"))
    assert(out(2).getAs[String]("tokens_digest") == md5s("i|j"))
    // attention-reset boundaries: doc starts at within-seq offsets;
    // seq1 opens mid-doc-1 (no 0 entry — a continuation, not a reset)
    assert(out.map(_.getAs[String]("doc_bounds")).toSeq ==
      Seq("0,3", "1", ""))
  }

  test("a long doc spans several sequences; boundaries counted once") {
    val docs = Seq((0L, "t1 t2 t3 t4 t5 t6")).toDF("doc_id", "text")
    val out = PackOps.packSequences(docs, "doc_id",
        split(col("text"), " "), shards = 1, seqLen = 2)
      .orderBy("seq_id").collect()
    assert(out.length == 3 && out.forall(_.getAs[Long]("n_docs") == 1L))
    assert(out(1).getAs[String]("tokens_digest") == md5s("t3|t4"))
    // the doc starts ONCE; later sequences are pure continuations
    assert(out.map(_.getAs[String]("doc_bounds")).toSeq ==
      Seq("0", "", ""))
  }

  test("shards pack independently; zero-token docs vanish without " +
      "shifting offsets") {
    val docs = Seq((0L, "a b"), (1L, "x y"), (2L, ""), (3L, "z w"),
      (4L, "c d")).toDF("doc_id", "text")
    // tokens col: empty text → empty array (not [""])
    val toks = when(col("text") === "", array().cast("array<string>"))
      .otherwise(split(col("text"), " "))
    val out = PackOps.packSequences(docs, "doc_id", toks,
        shards = 2, seqLen = 4).orderBy("shard", "seq_id").collect()
    // shard 0: docs 0,4 (doc 2 empty) → [a b c d]; shard 1: docs 1,3
    assert(out.length == 2)
    assert(out(0).getAs[Long]("shard") == 0L &&
      out(0).getAs[String]("tokens_digest") == md5s("a|b|c|d") &&
      out(0).getAs[Long]("n_docs") == 2L)
    assert(out(1).getAs[Long]("shard") == 1L &&
      out(1).getAs[String]("tokens_digest") == md5s("x|y|z|w"))
    assert(out.map(_.getAs[String]("doc_bounds")).toSeq ==
      Seq("0,2", "0,2"))
  }
}
