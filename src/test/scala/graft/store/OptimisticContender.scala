package graft.store

import org.apache.spark.sql.SparkSession

/** Child-process side of [[TwoJvmOptimisticSpec]]: a SECOND JVM
  * running a burst of [[OrderedDataset.writeOptimistic]] appends
  * against a dataset the spec's JVM is appending to at the same time.
  * args: dataset dir, base row offset, number of batches, rows per
  * batch. Writes `<dir>/../contender_ready` before the first append so
  * the spec can fire its own burst into the same window. Exit 0 = all
  * batches committed (losses retried internally by the optimistic
  * protocol); 1 = anything else.
  */
object OptimisticContender {
  def main(args: Array[String]): Unit = {
    val Array(dir, base0, nBatches0, rows0) = args
    val (base, nBatches, rows) = (base0.toLong, nBatches0.toInt, rows0.toInt)
    val spark = SparkSession.builder().master("local[1]")
      .config("spark.sql.shuffle.partitions", "1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions.col
    val code =
      try {
        val ds = new OrderedDataset(spark, dir)
        val ready = new java.io.File(
          new java.io.File(dir).getParent, "contender_ready")
        java.nio.file.Files.writeString(ready.toPath, "ready")
        (0 until nBatches).foreach { i =>
          val lo = base + i.toLong * rows
          ds.writeOptimistic(
            spark.range(lo, lo + rows).toDF("t")
              .withColumn("v", col("t") * 2.0),
            WriteOpts("t", NRows(1000)), maxAttempts = 20): Unit
          println(s"[contender] batch $i committed")
        }
        0
      } catch {
        case e: Throwable =>
          System.err.println(s"[contender] failed: $e")
          e.printStackTrace()
          1
      }
    spark.stop()
    sys.exit(code)
  }
}
