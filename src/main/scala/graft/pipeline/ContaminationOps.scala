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
}
