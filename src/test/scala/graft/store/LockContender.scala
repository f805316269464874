package graft.store

import org.apache.spark.sql.SparkSession

/** Child-process side of [[TwoJvmLockSpec]]: a SECOND JVM attempting a
  * locked write (`updateKv` — the cheapest operation that takes the
  * dataset's exclusive write lock) against a dataset directory owned
  * by the spec's JVM. Exit codes are the protocol: 0 = the write
  * committed; 3 = the advisory lock was honored and the writer failed
  * LOUDLY with the named error; 1 = anything else (a bug).
  *
  * This is the cross-process pin the in-process ConcurrencySpec cannot
  * be: the lock the reference gets from `flufl.lock`
  * (ref base.py:240-255) must work between PROCESSES sharing only the
  * filesystem, not between threads sharing a JVM.
  */
object LockContender {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[1]")
      .config("spark.sql.shuffle.partitions", "1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val code =
      try {
        new OrderedDataset(spark, dir)
          .updateKv(Map("contender" -> "won"))
        println("[contender] committed")
        0
      } catch {
        case e: IllegalStateException if Option(e.getMessage)
            .exists(_.contains("locked by another writer")) =>
          println(s"[contender] refused: ${e.getMessage}")
          3
        case e: Throwable =>
          System.err.println(s"[contender] unexpected: $e")
          e.printStackTrace()
          1
      }
    spark.stop()
    sys.exit(code)
  }
}
