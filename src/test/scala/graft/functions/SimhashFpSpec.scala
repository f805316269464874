package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[SimhashFp]] (r15): the one-loop fingerprint must be BIT-identical
  * to the r14 composition it replaced (distinct → per-word
  * `conv(substring(md5(w),1,15),16,10)` → aggregate/zip_with vote fold
  * → `vote*2 >= nw` majority), because fingerprints are stored in the
  * simhash index and replayed digit-wise by the DuckDB oracle. */
class SimhashFpSpec extends SparkSpec {
  import spark.implicits._

  private val nDigits = graft.pipeline.DedupOps.SimhashBits / 4

  /** The r14 composition, verbatim. */
  private def oldForm = {
    def packArray(v: org.apache.spark.sql.Column) =
      array((0 until nDigits).map { p =>
        val d = shiftright(v, 4 * (nDigits - 1 - p)).bitwiseAND(lit(15L))
        (0 until 4).map(b =>
          shiftleft(shiftright(d, b).bitwiseAND(lit(1L)), 16 * b))
          .reduce(_ + _)
      }: _*)
    def fingerprint(votes: org.apache.spark.sql.Column,
        nw: org.apache.spark.sql.Column) =
      (0 until graft.pipeline.DedupOps.SimhashBits).map { bit =>
        val p = bit / 4; val b = bit % 4
        val vote = shiftright(element_at(votes, p + 1), 16 * b)
          .bitwiseAND(lit(0xFFFFL))
        when(vote * 2 >= nw, lit(1L << bit)).otherwise(lit(0L))
      }.reduce(_ + _)
    (df: org.apache.spark.sql.DataFrame) =>
      df.select(col("id"), array_distinct(split(col("text"), " ")).as("ws"))
        .select(col("id"), size(col("ws")).as("nw"),
          transform(col("ws"), w =>
            conv(substring(md5(w), 1, nDigits), 16, 10).cast("long"))
            .as("hv"))
        .select(col("id"), col("nw"),
          aggregate(col("hv"), array_repeat(lit(0L), nDigits),
            (acc, v) => zip_with(acc, packArray(v), (a, b) => a + b),
            votes => fingerprint(votes, col("nw"))).as("simhash"))
        .select(col("id"), col("simhash"))
  }

  test("simhash_fp equals the conv/aggregate composition") {
    val docs = (Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy dot",
      "a", "", "a a a a a",
      "ümlaut 漢字 emojié words here and more of them",
      "x " * 200 + "tail") ++
      (0 until 50).map(i => s"doc $i body word${i % 7} " * (i % 5 + 1)))
      .zipWithIndex.map { case (t, i) => (i.toLong, t.trim) }
      .toDF("id", "text")
    val got = docs.select(col("id"),
        SimhashFp.simhashFp(split(col("text"), " ")).as("simhash"))
      .orderBy("id").as[(Long, Long)].collect().toSeq
    val want = oldForm(docs).orderBy("id")
      .as[(Long, Long)].collect().toSeq
    assert(got == want)
  }

  test("null text yields null; DedupOps.simhash output unchanged") {
    val docs = Seq((1L, Some("a b c")), (2L, None)).toDF("id", "text")
    val viaOps = graft.pipeline.DedupOps.simhash(docs, "id", "text")
      .orderBy("id").collect()
    assert(!viaOps(0).isNullAt(1))
    assert(viaOps(1).isNullAt(1))
    val want = oldForm(docs).orderBy("id").collect()
    assert(viaOps(0).getLong(1) == want(0).getLong(1))
    assert(want(1).isNullAt(1))
  }

  test("interpreted edge cases: empty array, null token poison") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    // empty array: nw = 0 -> every vote ties -> all 60 bits set
    assert(SimhashFp.fp(ArrayData.toArrayData(Array.empty[AnyRef])) ==
      (1L << 60) - 1)
    // null token poisons to 0 (the composition's null-vote collapse)
    assert(SimhashFp.fp(ArrayData.toArrayData(
      Array[AnyRef](UTF8String.fromString("a"), null))) == 0L)
  }
}
