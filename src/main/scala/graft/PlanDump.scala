package graft

import org.apache.spark.sql.SparkSession

/** Scratch plan-audit main (not part of the driver contract): prints
  * `explain("formatted")` for the named queries at the given SF dir —
  * the PLANS.md audit loop without a notebook.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.prepare(spark, d)
    catch { case e: Throwable =>
      System.err.println(s"[plan] prepare failed: ${e.getMessage}") }
    args.foreach { n =>
      println(s"===== $n =====")
      SparkEntry.queries(n)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
