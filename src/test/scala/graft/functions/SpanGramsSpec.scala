package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[SpanGrams]] (r15): the one-loop gram build must be byte-identical
  * to the r14 expression composition it replaced —
  * `transform(sequence(0, n-k), i -> struct(i,
  *   md5(concat_ws(" ", slice(ws, i+1, k)))))` under a
  * `when(size(ws) >= k, …).otherwise(array())` short-doc guard —
  * because the digests are stored in the persisted span index
  * (cfg `k<k>`) and replayed by the DuckDB oracle. */
class SpanGramsSpec extends SparkSpec {
  import spark.implicits._

  private def oldForm(k: Int) = {
    val ws = col("ws")
    when(size(ws) >= k,
      transform(sequence(lit(0), size(ws) - k),
        i => struct(i.as("pos"),
          md5(concat_ws(" ", slice(ws, i + 1, lit(k)))).as("h"))))
      .otherwise(array().cast("array<struct<pos:int,h:string>>"))
  }

  test("span_grams equals the transform/slice/concat_ws/md5 form") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog the quick brown",
      "a b",                        // shorter than every tested k
      "x y z",                      // exactly k for k=3
      "",                           // one empty token after split
      "tok tok tok tok tok tok",    // all-equal windows
      "ümlaut 漢字 emojié mix tail pad pad pad", // multi-byte UTF-8
      "a  b c d"                    // doubled space -> empty token
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), split(col("text"), " ").as("ws"))
    for (k <- Seq(2, 3, 8)) {
      val got = docs.select(col("id"),
          SpanGrams.spanGrams(col("ws"), k).as("g"))
        .orderBy("id").collect().map(_.toString).toSeq
      val want = docs.select(col("id"), oldForm(k).as("g"))
        .orderBy("id").collect().map(_.toString).toSeq
      assert(got == want, s"k=$k diverged")
    }
  }

  test("null token array yields null (explode drops it, as before)") {
    val df = Seq((1L, Some("a b c d")), (2L, None))
      .toDF("id", "text")
      .select(col("id"), split(col("text"), " ").as("ws"))
    val g = df.select(col("id"),
      SpanGrams.spanGrams(col("ws"), 2).as("g"))
    assert(g.filter(col("id") === 2L).head.isNullAt(1))
    // exploded: null and short arrays produce zero rows
    val rows = df.select(col("id"),
        explode(SpanGrams.spanGrams(col("ws"), 2)).as("g"))
      .groupBy("id").count().as[(Long, Long)].collect().toMap
    assert(rows == Map(1L -> 3L))
  }

  test("null tokens inside the array follow concat_ws skip semantics") {
    // tokenizers here never emit null tokens, but the contract is
    // pinned: concat_ws skips nulls without doubling the separator
    val df = spark.sql(
      "select 1L as id, array('a', cast(null as string), 'b', 'c') as ws")
    val got = df.select(SpanGrams.spanGrams(col("ws"), 3).as("g"))
      .head.toString
    val want = df.select(oldForm(3).as("g")).head.toString
    assert(got == want)
  }

  test("interpreted eval matches codegen") {
    val ws = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array("a", "b", "c", "d").map(
        org.apache.spark.unsafe.types.UTF8String.fromString))
    val arr = SpanGrams.grams(ws, 2)
    assert(arr.numElements() == 3)
    val r0 = arr.getStruct(0, 2)
    assert(r0.getInt(0) == 0)
    assert(r0.getUTF8String(1).toString ==
      org.apache.commons.codec.digest.DigestUtils.md5Hex("a b"))
  }
}
