package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.{LshConfig, SimilarityOps}

/** Scratch experiment main (not part of the driver contract): measure
  * the grouped-LSH fast path vs the window path on a TEMPLATE-SKEWED
  * corpus — the scenario where the fast path's task-granularity
  * concession (one in-task-chunked task per hot bucket instead of one
  * task per chunk) actually binds. The corpus is `nBase` random unit
  * vectors plus `nTemplate` exact copies of one vector: every template
  * pair is a true dup, so the hot bucket's chunk-truncated output
  * (~2·s·chunkSize pairs) is identical between paths; only the task
  * layout differs. Prints one JSON line per path with min-of-reps
  * seconds and the emitted pair count (asserted equal).
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val nBase = sys.env.getOrElse("SKEW_BASE", "500000").toLong
    val nTemplate = sys.env.getOrElse("SKEW_TEMPLATE", "8000").toLong
    // small chunk so the hot bucket chunks MANY times while the
    // truncated output (~2·s·chunkSize per band) stays collectable
    val chunkSize = sys.env.getOrElse("SKEW_CHUNK", "500").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val dim = 64
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic synthetic corpus: per-(id, coordinate) hash noise
    // (decorrelated across ids — smooth functions of id would lie on a
    // low-dim manifold full of accidental near-dups and hot buckets) +
    // nTemplate exact copies of one fixed template
    val base = spark.range(nBase).toDF("vec_id")
      .withColumn("embedding", transform(sequence(lit(0), lit(dim - 1)),
        j => (pmod(xxhash64(col("vec_id"), j), lit(2001L)) - 1000L)
          .cast("double") / 1000.0))
    val template = spark.range(nBase, nBase + nTemplate).toDF("vec_id")
      .withColumn("embedding", transform(sequence(lit(0), lit(dim - 1)),
        j => sin(j * 0.9) + lit(1.0)))
    val v = SimilarityOps.withNorm(
      base.unionByName(template), "vec_id", "embedding").persist()
    val n = v.count()
    // band width sized so expected occupancy sits just under the fast
    // path's gate for THIS chunk size — the fast path is live while
    // the template bucket (nTemplate rows) chunks many times over
    val cfg = LshConfig.forCorpusSize(n,
      targetBucketRows = math.max(1L, chunkSize / 8L))
    val planes = SimilarityOps.hyperplanes(cfg.nPlanes, dim)
    println(s"corpus=$n cfg=${cfg.nPlanes}x${cfg.planesPerBand} " +
      s"template=$nTemplate chunk=$chunkSize " +
      s"occ=${n / cfg.bucketsPerBand}")

    def time(label: String, fast: Boolean, dual: Boolean): Long = {
      val counts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        // autoShapeProbe = false on the fast rows: these A/B rows time
        // the LABELED shape, and on this template-skewed corpus the
        // default probe (est ≫ cutover) would silently flip the "fast"
        // runs to the window shape — making the cross-shape parity
        // check window-vs-window and the fast timings fiction
        // (ADVICE r9; LshConfigSpec's parity test does the same)
        val c = SimilarityOps.lshNearDupPairsGrouped(v, planes,
          cfg.planesPerBand, 0.95, chunkSize = chunkSize,
          corpusCount = if (fast) Some(n) else None,
          dualChunkProjections = dual,
          autoShapeProbe = !fast).count()
        val dt = (System.nanoTime() - t0) / 1e9
        (c, dt)
      }
      println(f"""{"path":"$label","sec":${counts.map(_._2).min}%.3f,""" +
        s""""pairs":${counts.head._1},"reps":$reps}""")
      counts.head._1
    }
    // window path first (corpusCount = None keeps it), then fast path;
    // each in single- and dual-ranking form — the dual columns measure
    // what the second chunk projection costs in each shape. Counts
    // must match across SHAPES for the same ranking mode; dual ≥
    // single because the second ranking can only rescue extra pairs
    // (it did: +61k real pairs on this corpus's hot random buckets)
    val pw1 = time("window-single", fast = false, dual = false)
    val pw2 = time("window-dual", fast = false, dual = true)
    val pf1 = time("fast-single", fast = true, dual = false)
    val pf2 = time("fast-dual", fast = true, dual = true)
    require(pw1 == pf1 && pw2 == pf2,
      s"shape outputs diverge: single $pw1/$pf1, dual $pw2/$pf2")
    require(pw2 >= pw1,
      s"dual ranking lost pairs vs single: $pw2 < $pw1")

    // the AUTO chooser: probe cost, estimate, and the shape it picks
    // on this skewed corpus vs a skew-free one (the base vectors
    // alone) — the round-9 done-criterion is "picks the winning shape
    // on both, probe cost < 5% of query time"
    def probeAndShape(name: String, corpus: org.apache.spark.sql
        .DataFrame, cnt: Long): Unit = {
      // min-of-reps like every other number this bench prints (the
      // first call carries the probe plan's one-time codegen + JIT)
      val timed = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val e = SimilarityOps.estimatedTopBucket(corpus, planes,
          cfg.planesPerBand, cnt)
        (e, (System.nanoTime() - t0) / 1e9)
      }
      val est = timed.head._1
      val auto = SimilarityOps.lshNearDupPairsGrouped(corpus, planes,
        cfg.planesPerBand, 0.95, chunkSize = chunkSize,
        corpusCount = Some(cnt))
      val windowShape = auto.queryExecution.optimizedPlan.toString
        .contains("row_number")
      println(f"""{"auto":"$name","probeSec":${timed.map(_._2).min}%.3f,""" +
        f""""estTopBucket":$est%.0f,""" +
        s""""cutover":${(LshConfig.SkewCutoverChunks *
          chunkSize).toLong},"shape":"${
          if (windowShape) "window" else "fast"}"}""")
    }
    probeAndShape("skewed", v, n)
    val vBase = SimilarityOps.withNorm(base, "vec_id", "embedding")
      .persist()
    val nb = vBase.count()
    probeAndShape("skew-free", vBase, nb)
    spark.stop()
  }
}
