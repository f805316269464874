package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Child-process side of [[SkewedClockTakedownSpec]]: a SECOND JVM —
  * launched with `-Dgraft.test.clock.skew.ms=<offset>` so every
  * segment dir it mints carries a skewed wall-clock prefix — adding a
  * digest-index increment. args: index dir, doc-id lo, doc-id hi.
  * Writes `<dir>/../skewadd_done` after the add commits. Exit 0 = the
  * segment landed.
  */
object SkewedAddContender {
  /** The deterministic corpus formula both JVMs share. */
  def mkDocs(spark: SparkSession, lo: Long, hi: Long) =
    spark.range(lo, hi).toDF("doc_id")
      .withColumn("text", concat_ws(" ", lit("skewdoc"),
        concat(lit("u"), col("doc_id")), lit("tail")))

  def main(args: Array[String]): Unit = {
    val Array(dir, lo0, hi0) = args
    val spark = SparkSession.builder().master("local[1]")
      .config("spark.sql.shuffle.partitions", "1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val code =
      try {
        DedupIndex.buildDigest(spark, dir,
          mkDocs(spark, lo0.toLong, hi0.toLong), "doc_id", "text",
          rowsPerFile = 10)
        java.nio.file.Files.writeString(new java.io.File(
          new java.io.File(dir).getParent, "skewadd_done").toPath, "ok")
        0
      } catch {
        case e: Throwable =>
          System.err.println(s"[skewadd] failed: $e")
          e.printStackTrace()
          1
      }
    spark.stop()
    sys.exit(code)
  }
}
