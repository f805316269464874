package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Child-process side of [[TwoJvmSegmentAddSpec]]: a SECOND JVM
  * running [[Bm25Index.add]] increments against an index the spec's
  * JVM is extending at the same time — the cross-process form of the
  * delta-segment compose claim (adds touch distinct segment dirs and
  * the scalar bumps are locked RMWs, so two uncoordinated processes
  * need no coordination at all). args: index dir, doc-id lo, doc-id
  * hi, number of add calls (the range splits evenly). Writes
  * `<dir>/../segadd_ready` before the first add. Exit 0 = all adds
  * committed.
  */
object SegmentAddContender {
  /** The deterministic corpus formula BOTH JVMs share (the spec builds
    * its reference one-shot index from the same expression). */
  def mkDocs(spark: SparkSession, lo: Long, hi: Long) =
    spark.range(lo, hi).toDF("doc_id")
      .withColumn("text", concat_ws(" ", lit("alpha"),
        concat(lit("tok"), pmod(col("doc_id"), lit(13L))),
        concat(lit("u"), col("doc_id")), lit("omega")))

  def main(args: Array[String]): Unit = {
    val Array(dir, lo0, hi0, nAdds0) = args
    val (lo, hi, nAdds) = (lo0.toLong, hi0.toLong, nAdds0.toInt)
    val spark = SparkSession.builder().master("local[1]")
      .config("spark.sql.shuffle.partitions", "1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val code =
      try {
        val ready = new java.io.File(
          new java.io.File(dir).getParent, "segadd_ready")
        java.nio.file.Files.writeString(ready.toPath, "ready")
        val step = (hi - lo) / nAdds
        (0 until nAdds).foreach { i =>
          val l = lo + i * step
          val h = if (i == nAdds - 1) hi else l + step
          Bm25Index.add(spark, dir, mkDocs(spark, l, h),
            "doc_id", "text", rowsPerFile = 50)
          println(s"[segadd] add $i committed ($l until $h)")
        }
        0
      } catch {
        case e: Throwable =>
          System.err.println(s"[segadd] failed: $e")
          e.printStackTrace()
          1
      }
    spark.stop()
    sys.exit(code)
  }
}
