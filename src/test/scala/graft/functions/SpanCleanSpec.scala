package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[SpanClean]] (r15): the one-sweep surviving-token join must be
  * byte-identical to the r14 composition it replaced —
  * `concat_ws(" ", transform(filter(transform(ws, (t,i) ->
  *   struct(t,i)), s -> !exists(dps, p -> p <= s.ti && s.ti < p+k)),
  *   s -> s.tok))`
  * — because `md5(joined)` is the span family's oracle-pinned
  * clean_digest. */
class SpanCleanSpec extends SparkSpec {
  import spark.implicits._

  private def oldForm(k: Int) =
    concat_ws(" ", transform(filter(
      transform(col("ws"), (t, i) => struct(t.as("tok"), i.as("ti"))),
      s => !exists(col("dps"), p => p <= s("ti") && s("ti") < p + k)),
      s => s("tok")))

  test("span_clean equals the transform/filter/exists composition") {
    val rows = Seq(
      // (tokens, duplicated positions)
      (Seq("a", "b", "c", "d", "e", "f"), Seq(1)),        // middle span
      (Seq("a", "b", "c", "d", "e", "f"), Seq(0, 3)),     // merged spans
      (Seq("a", "b", "c"), Seq(0)),                       // whole doc
      (Seq("a", "b", "c"), Seq.empty[Int]),               // nothing dup
      (Seq("a", "b", "c", "d", "e", "f", "g", "h"), Seq(5, 0)), // UNSORTED
      (Seq.empty[String], Seq.empty[Int]),                // empty doc
      (Seq("x"), Seq(0)),                                 // single covered
      (Seq("ü", "漢", "c", "d", "e"), Seq(2))             // multi-byte
    ).zipWithIndex.map { case ((ws, dps), i) => (i.toLong, ws, dps) }
      .toDF("id", "ws", "dps")
    for (k <- Seq(2, 3, 8)) {
      val got = rows.select(col("id"),
          SpanClean.spanClean(col("ws"), col("dps"), k).as("j"))
        .orderBy("id").as[(Long, String)].collect().toSeq
      val want = rows.select(col("id"), oldForm(k).as("j"))
        .orderBy("id").as[(Long, String)].collect().toSeq
      assert(got == want, s"k=$k diverged")
    }
  }

  test("null ws / null dps / null tokens match the composition") {
    val df = spark.sql(
      """select * from values
        |  (1L, array('a','b','c','d'), cast(null as array<int>)),
        |  (2L, cast(null as array<string>), array(0)),
        |  (3L, array('a', cast(null as string), 'c', 'd'), array(9)),
        |  (4L, array('a', cast(null as string), 'c', 'd'),
        |    cast(array() as array<int>))
        |as t(id, ws, dps)""".stripMargin)
    val got = df.select(col("id"),
        SpanClean.spanClean(col("ws"), col("dps"), 2).as("j"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    val want = df.select(col("id"), oldForm(2).as("j"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == want.toSeq)
    // and the digests of the empty-result rows equal md5('')
    assert(got(1)._2 == "")
  }

  test("interpreted eval: sweep geometry") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def arr(s: String*) = ArrayData.toArrayData(
      s.map(UTF8String.fromString).toArray)
    def ints(i: Int*) = ArrayData.toArrayData(i.toArray)
    // k=3, dup at 2: tokens 2,3,4 covered
    assert(SpanClean.clean(arr("a","b","c","d","e","f"), ints(2), 3)
      .toString == "a b f")
    // overlapping dups 1 and 2 merge: covers 1..4
    assert(SpanClean.clean(arr("a","b","c","d","e","f"), ints(1, 2), 3)
      .toString == "a f")
    assert(SpanClean.clean(null, ints(0), 3).toString == "")
    assert(SpanClean.clean(arr("a","b"), null, 3).toString == "")
  }
}
