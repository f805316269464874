package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scratch decomposition of the span-dedup pipeline's cost (r15, not
  * part of the driver contract): times each cumulative prefix of
  * [[DedupOps.spanDedupTokens]] over the BPE token stream so the
  * optimization target is a measured stage, not a guess —
  *   tokens  : scan + BPE encode (the `base` frame)
  *   grams   : + the stride-1 k-gram md5 table (map-side)
  *   duppos  : + the (hb) exchange, window count, dup filter,
  *             groupBy(id) collect (the one big shuffle)
  *   full    : + the assemble join (re-scan + re-encode of base,
  *             span math, clean digest)
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.pipeline.SpanPhaseBench
  */
object SpanPhaseBench {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val k = 8
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.configure(spark)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def best(body: => Unit): Double =
      (1 to reps).map { _ =>
        val t0 = System.nanoTime(); body
        (System.nanoTime() - t0) / 1e9
      }.min
    val docs = graft.Tables.documents(spark, d).select("doc_id", "text")
    def base = docs.select(col("doc_id").cast("long").as("id"),
      graft.functions.Bpe.bpeTokens(col("text"),
        graft.functions.Bpe.fixtureTable).as("ws"))
    def grams = DedupOps.spanGramTable(base, k)
    def dupPos = {
      val slim = grams.select(col("id"), col("pos"),
        unhex(col("h")).as("hb"))
      slim.withColumn("cnt",
          count(lit(1)).over(Window.partitionBy(col("hb"))))
        .filter(col("cnt") >= 2)
        .groupBy("id")
        .agg(sort_array(collect_list(col("pos"))).as("dps"))
    }
    def full = DedupOps.spanDedupTokens(docs, "doc_id",
      graft.functions.Bpe.bpeTokens(col("text"),
        graft.functions.Bpe.fixtureTable), k)
    noop(full) // warm: scan, codegen, fixture table
    val tTok = best(noop(base))
    val tGrams = best(noop(grams))
    val tDup = best(noop(dupPos))
    val tFull = best(noop(full))
    println(f"[spanphase] sf=$d cpus=$cpus reps=$reps k=$k")
    println(f"[spanphase] tokens=$tTok%7.3f grams=$tGrams%7.3f " +
      f"duppos=$tDup%7.3f full=$tFull%7.3f")
    spark.stop()
  }
}
