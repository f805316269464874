package graft

import org.apache.spark.sql.SparkSession
import graft.pipeline.{LshConfig, SimilarityOps}

/** Scratch experiment main (not part of the driver contract): execute
  * the over-cap CHUNKED LSH regime end-to-end on the real 100×
  * embeddings — the round-9 verdict's stretch ask. Past
  * [[LshConfig.MaxBits]] a corpus cannot widen its band space, so
  * expected occupancy exceeds the chunk size and the window+chunk
  * shape must carry the whole query; until now that regime was
  * gate-tested but never EXECUTED at scale. A 5×10⁹ corpus at the
  * 20-bit ceiling runs ~4800 rows/bucket; we reproduce the SAME
  * execution shape on the 200k-vector 100× corpus by narrowing the
  * bands until occupancy is chunk-deep (bits=5 → ~6.2k rows/bucket ≈
  * 12 chunks of 500), raising `maxExpectedBucketRows` to admit it
  * through the strict gate arm — the plan, shuffles, explode, and
  * per-task loops are identical to the ceiling regime's.
  *
  * Prints: wall time of the over-cap shape (single and dual ranking),
  * the dual-over-single pair lift at real scale, and overlap vs the
  * canonical within-cap config on the same data (the within-cap run
  * is the production reference output).
  */
object OverCapBench {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf10")
    val threshold = 0.4  // the canonical queries' CosThreshold
    // chunk 500 on a ~6.2k-row bucket = ~12 chunks deep (deeper into
    // the chunking regime than the ceiling's ~4000-row default would
    // be) while bounding the comparison budget at 2·chunk·n·bands
    val chunk = sys.env.getOrElse("OVERCAP_CHUNK", "500").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "24g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val v = SimilarityOps.withNorm(Tables.embeddings(spark, d),
      "vec_id", "embedding").persist()
    val n = v.count()
    println(s"corpus=$n chunk=$chunk")

    def run(label: String, nPlanes: Int, bits: Int, dual: Boolean,
        maxExp: Long, chunkSize: Int, rankings: Int = 2)
        : Set[(Long, Long)] = {
      val planes = SimilarityOps.hyperplanes(nPlanes, 64)
      val t0 = System.nanoTime()
      val pairs = SimilarityOps.lshNearDupPairsGrouped(v, planes, bits,
          threshold, corpusCount = Some(n),
          maxExpectedBucketRows = maxExp, chunkSize = chunkSize,
          dualChunkProjections = dual, chunkRankings = rankings)
        .select("i", "j").as[(Long, Long)].collect().toSet
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"run":"$label","cfg":"${nPlanes}x$bits",""" +
        f""""occ":${n / (1L << bits)},"dual":$dual,""" +
        f""""rankings":${if (dual) rankings else 1},"chunk":$chunkSize,""" +
        f""""sec":$sec%.1f,"pairs":${pairs.size}}""")
      pairs
    }
    // the canonical within-cap reference (what forCorpusSize gives 2M,
    // default chunk — the fast path, buckets never chunk)
    val cfgIn = LshConfig.forCorpusSize(n)
    val inCap = run("within-cap", cfgIn.nPlanes, cfgIn.planesPerBand,
      dual = true, maxExp = 4L * LshConfig.TargetBucketRows,
      chunkSize = LshConfig.DefaultChunkRows)
    // in-session A/B: the same canonical config single-ranked — on a
    // non-chunking corpus the pair sets must be identical and the
    // delta is the honest dual cost (one projection column + probe)
    val inCapSingle = run("within-cap-single", cfgIn.nPlanes,
      cfgIn.planesPerBand, dual = false,
      maxExp = 4L * LshConfig.TargetBucketRows,
      chunkSize = LshConfig.DefaultChunkRows)
    require(inCapSingle == inCap,
      "a non-chunking corpus must emit identical pairs either ranking")
    // the over-cap chunked regime: 4 bands × 5 bits → ~6.2k/bucket,
    // ~12 chunks deep — the MaxBits-ceiling shape, executed for real
    val single = run("over-cap-single", 20, 5, dual = false,
      maxExp = 1000000L, chunkSize = chunk)
    val dual = run("over-cap-dual", 20, 5, dual = true,
      maxExp = 1000000L, chunkSize = chunk)
    require(single.subsetOf(dual), "dual must be a superset of single")
    // the round-10 question: does a THIRD independent ranking square
    // the residual miss again, and at what in-regime cost?
    val triple = run("over-cap-triple", 20, 5, dual = true,
      maxExp = 1000000L, chunkSize = chunk, rankings = 3)
    require(dual.subsetOf(triple),
      "triple must be a superset of dual (passes 1-2 are identical)")
    // the round-11 question: the fourth rung of the same ladder
    val quad = run("over-cap-quad", 20, 5, dual = true,
      maxExp = 1000000L, chunkSize = chunk, rankings = 4)
    require(triple.subsetOf(quad),
      "quad must be a superset of triple (passes 1-3 are identical)")
    def pct(a: Int, b: Int) = if (b == 0) 0.0 else a.toDouble / b * 100
    println(f"""{"dual_lift_pairs":${dual.size - single.size},""" +
      f""""triple_lift_pairs":${triple.size - dual.size},""" +
      f""""quad_lift_pairs":${quad.size - triple.size},""" +
      f""""single_of_dual_pct":${pct(single.size, dual.size)}%.1f,""" +
      f""""dual_of_triple_pct":${pct(dual.size, triple.size)}%.1f,""" +
      f""""incap_found_by_overcap_dual_pct":${
        pct(inCap.intersect(dual).size, inCap.size)}%.1f,""" +
      f""""incap_found_by_overcap_single_pct":${
        pct(inCap.intersect(single).size, inCap.size)}%.1f}""")
    spark.stop()
  }
}
