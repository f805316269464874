package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class SpanIndexSpec extends SparkSpec {
  import spark.implicits._

  // corpus and batch share the run 'p q r s'; the batch also doubles
  // 'w x y z' internally (within-batch global counting)
  val corpus = Seq(
    (0L, "a b p q r s c"),
    (1L, "unrelated words entirely here now"))
    .toDF("doc_id", "text")
  val batch = Seq(
    (10L, "m p q r s n"),
    (11L, "w x y z k w x y z"),
    (12L, "fresh tokens nothing shared"))
    .toDF("doc_id", "text")

  private def rows(df: DataFrame) =
    df.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap

  test("batch dedup against the index == spanDedup over corpus ∪ " +
      "batch restricted to the batch") {
    val dir = tmpDir("spanidx")
    DedupIndex.buildSpanGrams(spark, dir, corpus, "doc_id", "text",
      k = 4, rowsPerFile = 8)
    val inc = rows(DedupIndex.dedupBatchSpans(spark, dir, batch,
      "doc_id", "text", k = 4))
    val full = rows(DedupOps.spanDedup(
      corpus.unionByName(batch), "doc_id", "text", k = 4)
      .filter(col("doc_id") >= 10L))
    assert(inc == full)
    // and the shared run was actually caught, plus the within-batch
    // double
    assert(inc(10L)._2 == 4L && inc(11L)._2 > 0L && inc(12L)._2 == 0L)
  }

  test("replay mode (includeBatchCnt=false) reproduces the first " +
      "attempt after the index absorbed the batch") {
    val dir = tmpDir("spanidx_replay")
    DedupIndex.buildSpanGrams(spark, dir, corpus, "doc_id", "text",
      k = 4, rowsPerFile = 8)
    val first = rows(DedupIndex.dedupBatchSpans(spark, dir, batch,
      "doc_id", "text", k = 4))
    DedupIndex.buildSpanGrams(spark, dir, batch, "doc_id", "text",
      k = 4, rowsPerFile = 8, incrementTag = Some("b1"))
    // tag replay: absorbing again is a no-op
    DedupIndex.buildSpanGrams(spark, dir, batch, "doc_id", "text",
      k = 4, rowsPerFile = 8, incrementTag = Some("b1"))
    val replay = rows(DedupIndex.dedupBatchSpans(spark, dir, batch,
      "doc_id", "text", k = 4, includeBatchCnt = false))
    assert(replay == first)
  }

  test("probing with mismatched k or a foreign kind fails loudly") {
    val dir = tmpDir("spanidx_cfg")
    DedupIndex.buildSpanGrams(spark, dir, corpus, "doc_id", "text",
      k = 4)
    val e = intercept[IllegalArgumentException] {
      DedupIndex.dedupBatchSpans(spark, dir, batch, "doc_id", "text",
        k = 5)
    }
    assert(e.getMessage.contains("k4"))
  }
}
