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
    assert(out.map(_.getLong(2)).toSeq == Seq(4L, 4L, 2L))
    assert(out.map(_.getLong(3)).toSeq == Seq(2L, 2L, 1L))
    assert(out(0).getString(4) == md5s("a|b|c|d"))
    assert(out(1).getString(4) == md5s("e|f|g|h"))
    assert(out(2).getString(4) == md5s("i|j"))
  }

  test("a long doc spans several sequences; boundaries counted once") {
    val docs = Seq((0L, "t1 t2 t3 t4 t5 t6")).toDF("doc_id", "text")
    val out = PackOps.packSequences(docs, "doc_id",
        split(col("text"), " "), shards = 1, seqLen = 2)
      .orderBy("seq_id").collect()
    assert(out.length == 3 && out.forall(_.getLong(3) == 1L))
    assert(out(1).getString(4) == md5s("t3|t4"))
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
    assert(out(0).getLong(0) == 0L &&
      out(0).getString(4) == md5s("a|b|c|d") && out(0).getLong(3) == 2L)
    assert(out(1).getLong(0) == 1L &&
      out(1).getString(4) == md5s("x|y|z|w"))
  }
}
