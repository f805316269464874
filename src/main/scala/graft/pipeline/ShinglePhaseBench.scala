package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch decomposition of the minhash/shingle family's cost (r15,
  * not part of the driver contract) — cumulative prefixes of the
  * p_dedup_minhash_lsh pipeline plus the exploded shingle table the
  * exact-Jaccard family uses:
  *   shingles : scan + per-position slice/join n-grams + distinct
  *   sig      : + NumHashes md5s per shingle, per-seed min
  *   cand     : + banded self-join candidates
  *   table    : scan + EXPLODED distinct shingles (p_corpus_dedup's
  *              front)
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.pipeline.ShinglePhaseBench
  */
object ShinglePhaseBench {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
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
      .repartition(spark.sparkContext.defaultParallelism)
    def sh = DedupOps.shingleArrays(docs, "doc_id", "text", 3)
    def sig = DedupOps.minhashSignature(sh, 12)
    def cand = DedupOps.lshCandidates(sig, 12, 4)
    def table = DedupOps.shingleTable(docs, "doc_id", "text", 3)
    noop(sig) // warm
    val tSh = best(noop(sh))
    val tSig = best(noop(sig))
    val tCand = best(noop(cand))
    val tTable = best(noop(table))
    println(f"[shinglephase] sf=$d cpus=$cpus reps=$reps")
    println(f"[shinglephase] shingles=$tSh%7.3f sig=$tSig%7.3f " +
      f"cand=$tCand%7.3f table=$tTable%7.3f")
    spark.stop()
  }
}
