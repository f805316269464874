package graft

import org.apache.spark.sql.SparkSession
import graft.pipeline.{LshConfig, SimilarityOps}

/** Scratch experiment main (not part of the driver contract): min-of-N
  * in-session A/B of the WITHIN-CAP grouped-LSH default — the dual
  * (and triple) chunk-ranking cost on a healthy, non-chunking corpus,
  * where the pair set is identical by construction and the delta is
  * pure overhead (projection columns through the banding shuffle + the
  * shape probe). OverCapBench times each variant once, first-run JIT
  * included — this main exists because a 1-rep cold read once looked
  * like a 1.7× regression that min-of-3 showed to be ~1.1×.
  */
object InCapABBench {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf10")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val threshold = 0.4
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "24g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val v = SimilarityOps.withNorm(Tables.embeddings(spark, d),
      "vec_id", "embedding").persist()
    val n = v.count()
    val cfg = LshConfig.forCorpusSize(n)
    val planes = SimilarityOps.hyperplanes(cfg.nPlanes, 64)
    println(s"corpus=$n cfg=${cfg.nPlanes}x${cfg.planesPerBand} reps=$reps")
    def med(ts: Seq[Double]): Double = {
      val s = ts.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    def run(label: String, dual: Boolean, rankings: Int): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val c = SimilarityOps.lshNearDupPairsGrouped(v, planes,
          cfg.planesPerBand, threshold, corpusCount = Some(n),
          dualChunkProjections = dual, chunkRankings = rankings).count()
        ((System.nanoTime() - t0) / 1e9, c)
      }
      println(f"""{"run":"$label","sec":${times.map(_._1).min}%.2f,""" +
        f""""med":${med(times.map(_._1))}%.2f,""" +
        f""""pairs":${times.head._2}}""")
    }
    // interleave-free order, single first so dual pays any shared JIT
    run("single", dual = false, rankings = 1)
    run("dual", dual = true, rankings = 2)
    run("triple", dual = true, rankings = 3)
    run("quad", dual = true, rankings = 4)
    spark.stop()
  }
}
