package graft

import org.apache.spark.sql.SparkSession

/** Dump formatted physical plans for plan-quality review (pushdown,
  * broadcast, codegen spans). Not part of the driver contract.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq else Seq(
      "f3_range_trim", "s2_pruned_scan", "q1_pricing_summary",
      "j1_join_agg", "g2_time_bins_5m", "p_dedup_minhash_lsh",
      "p_ann_topk", "p_ann_ivf_indexed", "g7_sessions", "g8_sliding",
      "p_sample_stratified", "p_embed_quantize", "a8_snapshot_spine",
      "p_shuffle_coords", "p_quality_topfrac", "p_token_budget",
      "p_contam_fraction", "p_corpus_stats", "m9_time_travel",
      "p_segment_dedup", "p_text_perplexity", "p_kmeans_step",
      "p_data_mix")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(SparkEntry.queries(n)(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
