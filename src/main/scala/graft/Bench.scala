package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_SKIP_PREPARE: skip the store-fixture build when
    // benchmarking only pipeline queries (they ensure their own state)
    if (!sys.env.contains("SPARK_GRAFT_SKIP_PREPARE"))
      try SparkEntry.prepare(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[bench] prepare failed: ${e.getMessage}") }
    // warm up JIT/codegen and the scan path so the first timed query
    // isn't charged for JVM startup (run order is map-order-dependent)
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .write.mode("overwrite").format("noop").save()
      SparkEntry.entry(spark).write.mode("overwrite").format("noop").save()
    } catch { case _: Throwable => () }
    // Optional subsetting for local iteration: SPARK_GRAFT_QUERIES is a
    // comma-separated allowlist; SPARK_GRAFT_REPS overrides min-of-n.
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // min-of-3 by default: r3's driver run showed ±5x outliers on a
    // noisy shared host with min-of-2 (g7_sessions 5.04s there, 0.67s
    // in every local rerun) — a third rep is cheap insurance
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val selected = SparkEntry.queries.filter { case (n, _) =>
      only.forall(_.contains(n)) }
    val results = selected.map { case (name, fn) =>
      // noop sink: forces full computation of every output column
      // (count() would let Catalyst prune the projections away).
      // Best of 2 runs: the shared host shows ±50% scheduling noise and
      // min-of-n is the standard steady-state estimator.
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}") }
        val dt = (System.nanoTime() - t0) / 1e9
        // release per-query persisted frames so queries don't contend
        spark.catalog.clearCache()
        dt
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
