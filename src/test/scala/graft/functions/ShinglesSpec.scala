package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[Shingles]] (r15): each one-loop form must be byte-identical to
  * the r14 composition it replaced — shingle strings feed
  * oracle-replayed md5s and persisted minhash indexes. */
class ShinglesSpec extends SparkSpec {
  import spark.implicits._

  private def upTo(hi: org.apache.spark.sql.Column) =
    when(hi >= 1, sequence(lit(1), hi))
      .otherwise(array().cast("array<int>"))

  private val docs = (Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b", "", "a a a a a",
    "ümlaut 漢字 emojié mix tail pad pad pad",
    "a  b c d") ++ // doubled space -> empty token
    (0 until 40).map(i => s"doc $i body word${i % 7} tail " * (i % 4 + 1)))
    .zipWithIndex.map { case (t, i) => (i.toLong, Some(t.trim)) }
    .toDF("id", "text")
    .unionByName(Seq((999L, None: Option[String])).toDF("id", "text"))

  test("word_ngrams equals transform/slice/array_join (+distinct)") {
    for (n <- Seq(2, 3, 5)) {
      val ws = split(col("text"), " ")
      val oldNg = transform(upTo(size(ws) - (n - 1)),
        i => array_join(slice(ws, i, lit(n)), " "))
      val got = docs.select(col("id"),
          TextOps_wordNgrams(col("text"), n).as("g"),
          TextOps_wordShingles(col("text"), n).as("gd"))
        .orderBy("id").collect().map(_.toString).toSeq
      val want = docs.select(col("id"), oldNg.as("g"),
          array_distinct(oldNg).as("gd"))
        .orderBy("id").collect().map(_.toString).toSeq
      assert(got == want, s"n=$n diverged")
    }
  }

  private def TextOps_wordNgrams(c: org.apache.spark.sql.Column, n: Int) =
    graft.pipeline.TextOps.wordNgrams(c, n)
  private def TextOps_wordShingles(c: org.apache.spark.sql.Column, n: Int) =
    graft.pipeline.TextOps.wordShingles(c, n)

  test("char_shingles equals transform/substr") {
    for (n <- Seq(3, 8)) {
      val oldCs = transform(upTo(length(col("text")) - (n - 1)),
        i => col("text").substr(i, lit(n)))
      val got = docs.select(col("id"),
          graft.pipeline.TextOps.charShingles(col("text"), n).as("g"))
        .orderBy("id").collect().map(_.toString).toSeq
      val want = docs.select(col("id"), oldCs.as("g"))
        .orderBy("id").collect().map(_.toString).toSeq
      assert(got == want, s"n=$n diverged")
    }
  }

  test("minhash_sig equals the per-seed array_min columns") {
    val k = 12
    val sh = graft.pipeline.DedupOps.shingleArrays(docs, "id", "text", 3)
    val got = graft.pipeline.DedupOps.minhashSignature(sh, k)
      .orderBy("id").collect().map(_.toString).toSeq
    val want = sh.select(col("id") +:
        (0 until k).map(i =>
          array_min(transform(col("gs"), g =>
            md5(concat(lit(s"$i|"), g)))).as(s"s$i")): _*)
      .orderBy("id").collect().map(_.toString).toSeq
    assert(got == want)
  }

  test("minhash_sig null/empty shingle sets give null entries") {
    val df = spark.sql(
      """select * from values
        |  (1L, cast(array() as array<string>)),
        |  (2L, cast(null as array<string>)),
        |  (3L, array('a b c', cast(null as string)))
        |as t(id, gs)""".stripMargin)
    val got = df.select(col("id"),
        Shingles.minhashSigCol(col("gs"), 3).as("s"))
      .orderBy("id").collect()
    assert(got(0).getSeq[String](1) == Seq(null, null, null))
    assert(got(1).getSeq[String](1) == Seq(null, null, null))
    val s3 = got(2).getSeq[String](1)
    assert(s3.forall(_ != null)) // null shingle skipped, 'a b c' hashed
    val want = df.select(col("id"),
        array((0 until 3).map(i => array_min(transform(col("gs"),
          g => md5(concat(lit(s"$i|"), g))))): _*).as("s"))
      .orderBy("id").collect()
    assert((0 until 3).forall(r =>
      got(r).getSeq[String](1) == want(r).getSeq[String](1)))
  }
}
