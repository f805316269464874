package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling main (not part of the driver contract): min-of-n
  * timing of named queries, stripping the ±50% host scheduling noise
  * that single runs show.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    // SPARK_GRAFT_CONF="k=v;k=v" — plan experiments (e.g. force the
    // shuffle-join regime with spark.sql.autoBroadcastJoinThreshold=-1)
    sys.env.get("SPARK_GRAFT_CONF").foreach(
      _.split(";").map(_.trim).filter(_.nonEmpty).foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => builder.config(k, v): Unit
          case _ => throw new IllegalArgumentException(
            s"SPARK_GRAFT_CONF segment '$kv' is not k=v")
        }
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_SKIP_PREPARE: same contract as Bench — fixture-free
    // query subsets skip the store/index builds
    if (!sys.env.contains("SPARK_GRAFT_SKIP_PREPARE"))
      try SparkEntry.prepare(spark, d)
      catch { case e: Throwable =>
        System.err.println(s"[probe] prepare failed: ${e.getMessage}") }
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "p_dedup_minhash_lsh", "p_dedup_simhash", "p_dedup_ngram_jaccard",
      "p_dedup_exact", "p_dedup_embedding_lsh", "p_multimodal_framesample",
      "j1_join_agg", "j18_semi_join", "j5_multi_join", "g3_by_x_rows",
      "g2_time_bins_1d_right", "p_text_fingerprint", "q1_pricing_summary")
    // warm-up
    spark.read.parquet(s"$d/lineitem.parquet")
      .write.mode("overwrite").format("noop").save()
    names.foreach { n =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, d)
          .write.mode("overwrite").format("noop").save()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $n%-28s min=${times.min}%6.2f  " +
        f"med=${times.sorted.apply(reps / 2)}%6.2f  max=${times.max}%6.2f")
    }
    spark.stop()
  }
}
