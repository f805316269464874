package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline._

/** Scratch profiling main (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name%-32s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val docs = Tables.documents(spark, d).select("doc_id", "text")
      .repartition(32)
    time("read+repartition only")(noop(docs))
    val sh = docs.select(col("doc_id"), col("text"),
      explode(sequence(lit(1), length(col("text")) - 7)).as("__i"))
    time("explode seq (carry text)")(noop(sh))
    val h = sh.select(col("doc_id"),
      md5(col("text").substr(col("__i"), lit(8))).as("__h"))
    time("explode+md5")(noop(h))
    time("explode+md5+agg")(noop(h.groupBy("doc_id")
      .agg(min("__h"), max("__h"))))
    time("fingerprintDF full")(noop(
      TextOps.fingerprintDF(docs, "doc_id", "text").orderBy("doc_id")))
    time("fingerprintDF again")(noop(
      TextOps.fingerprintDF(docs, "doc_id", "text").orderBy("doc_id")))
    val sh3 = DedupOps.shingleTable(docs, "doc_id", "text", 3)
    time("wordShingles explode")(noop(sh3))
    val sig = DedupOps.minhashSignature(sh3, 12)
    time("minhash signature")(noop(sig))
    time("minhash full")(noop {
      val shp = sh3.persist()
      DedupOps.jaccardVerify(
        DedupOps.lshCandidates(DedupOps.minhashSignature(shp, 12), 12, 4),
        shp, 0.8)
    })
    spark.stop()
  }
}
