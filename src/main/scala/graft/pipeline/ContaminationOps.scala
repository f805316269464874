package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — flag training documents that share any
  * word n-gram with an evaluation set (the GPT-3-style 13-gram overlap
  * check; n is a knob because the right width depends on tokenizer and
  * document length).
  *
  * Shape: distinct n-grams per training doc (map-side shingling, the
  * same `TextOps.wordShingles` representation the dedup family uses)
  * equi-joined against the DISTINCT n-gram set of the eval corpus,
  * counted per training doc. The eval side is benchmark-sized —
  * thousands of documents, millions of n-grams at most — so it is
  * orders of magnitude smaller than the training corpus and AQE
  * broadcasts it on its own (no hint: a genuinely large eval set must
  * be allowed to shuffle-join). The training side never shuffles its
  * text — only (id, gram) pairs — and the output is one row per
  * CONTAMINATED doc, which a well-built corpus keeps tiny.
  */
object ContaminationOps {

  /** (id, n_shared) for every training doc sharing >= 1 distinct word
    * n-gram with the eval set; n_shared counts the doc's distinct
    * n-grams that appear anywhere in eval.
    */
  def overlap(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val tsh = DedupOps.shingleTable(train, idCol, textCol, n)
    val esh = DedupOps.shingleTable(eval, idCol, textCol, n)
      .select(col("g")).distinct()
    tsh.join(esh, "g")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** [[overlap]] with a Bloom prefilter on the training side — the
    * 100 TB plan shape. The eval n-gram set is bounded (a benchmark:
    * thousands of docs), so it is collected ONCE into a driver-built
    * Bloom filter ([[graft.functions.BloomFns]]) and embedded in the
    * plan as a codegen'd map-side predicate over the training shingles:
    * the join's probe side shrinks from every training n-gram to the
    * (true overlaps + fpp·|train grams|) survivors BEFORE any shuffle.
    * The exact equi-join then removes Bloom false positives, so the
    * result is IDENTICAL to [[overlap]] (same oracle) — the filter
    * changes plan cost, never the answer. With fpp=1e-3, the shuffle
    * shrinks ~1000× on an uncontaminated corpus.
    */
  def bloomOverlap(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int, fpp: Double = 0.001): DataFrame = {
    // Size the filter from a cheap upper bound (total grams ≥ distinct
    // grams — one map-side pass, no shuffle), then build over the
    // NON-distinct gram stream: Bloom insertion is idempotent, so
    // skipping the distinct avoids materializing the eval pipeline
    // twice (no cache/checkpoint to leak). Oversizing only lowers the
    // effective fpp.
    val evGrams = DedupOps.shingleTable(eval, idCol, textCol, n)
    val expected = eval
      .select(coalesce(sum(greatest(
        size(TextOps.wsTokens(col(textCol))) - lit(n - 1), lit(0))
        .cast("long")), lit(0L)))
      .first().getLong(0)
    val bloomBytes = graft.functions.BloomFns.serialize(
      graft.functions.BloomFns.build(evGrams, col("g"),
        math.max(expected, 1L), fpp))
    val tsh = DedupOps.shingleTable(train, idCol, textCol, n)
      .filter(graft.functions.BloomFns.mightContain(bloomBytes, col("g")))
    tsh.join(evGrams.select(col("g")).distinct(), "g")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shared"))
  }
}
