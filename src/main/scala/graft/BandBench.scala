package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.SimilarityOps

/** Scratch experiment main (not part of the driver contract): isolate
  * the BANDING stage's cost as the plane count grows. The banding
  * expression unrolls one fused dot-product loop per plane; past the
  * JIT's per-method bytecode ceiling the whole-stage-codegen method
  * stops compiling and runs interpreted — a cliff, not a slope. This
  * prints sec per plane count over the same corpus so the cliff (if
  * any) is measured, not guessed.
  */
object BandBench {
  def main(args: Array[String]): Unit = {
    val nRows = sys.env.getOrElse("BAND_ROWS", "200000").toLong
    val dim = 64
    val planeCounts = sys.env.getOrElse("BAND_PLANES", "24,48,52,60,80")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val v = SimilarityOps.withNorm(
      spark.range(nRows).toDF("vec_id")
        .withColumn("embedding", transform(sequence(lit(0), lit(dim - 1)),
          j => (pmod(xxhash64(col("vec_id"), j), lit(2001L)) - 1000L)
            .cast("double") / 1000.0)),
      "vec_id", "embedding").persist()
    v.count(): Unit
    planeCounts.foreach { np =>
      val planes = SimilarityOps.hyperplanes(np, dim)
      val bits = math.max(1, np / 4)
      // warm once (codegen compile), then min-of-3
      def run(): Double = {
        val t0 = System.nanoTime()
        SimilarityOps.lshBands(v, planes, bits)
          .groupBy("band_id").count().collect(): Unit
        (System.nanoTime() - t0) / 1e9
      }
      run(): Unit
      val sec = (1 to 3).map(_ => run()).min
      println(f"""{"planes":$np,"sec":$sec%.3f}""")
    }
    spark.stop()
  }
}
