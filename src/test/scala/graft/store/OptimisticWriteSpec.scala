package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[OrderedDataset.writeOptimistic]] — the optimistic-commit
  * protocol: prepare unlocked, validate the planned-against generation
  * inside a brief lock hold, retry the loser. Deterministic conflicts
  * are injected via the `beforeOptimisticCommit` seam (the exact
  * window a competing commit lands in); the cross-process version is
  * [[TwoJvmOptimisticSpec]].
  */
class OptimisticWriteSpec extends SparkSpec {
  import spark.implicits._

  private val opts = WriteOpts("t", NRows(1000))

  private def df(lo: Long, n: Long) =
    spark.range(lo, lo + n).toDF("t").withColumn("v", col("t") * 2.0)

  private def newDs() =
    new OrderedDataset(spark, s"${tmpDir("optim")}/ds")

  test("a commit that loses its race re-plans against the winner's " +
      "state and lands: all three writes' rows present, three " +
      "generations, no tmp residue") {
    val ds = newDs()
    ds.write(df(0, 1000), opts): Unit
    val g1 = ds.meta.generation
    // inject a competing LOCKED write between the optimistic
    // prepare and its commit gate; self-disarm so the retry commits
    ds.beforeOptimisticCommit = () => {
      ds.beforeOptimisticCommit = () => ()
      ds.write(df(1000, 500), opts): Unit
    }
    try ds.writeOptimistic(df(2000, 700), opts): Unit
    finally ds.beforeOptimisticCommit = () => ()
    assert(ds.meta.generation == g1 + 2,
      "expected winner commit + retried commit")
    assert(ds.df.count() == 2200L)
    assert(ds.df.agg(countDistinct(col("t"))).head().getLong(0) == 2200L)
    val tmps = new java.io.File(ds.dir).listFiles()
      .filter(f => f.isDirectory &&
        f.getName.startsWith(OrderedDataset.TmpDirPrefix))
    assert(tmps.isEmpty, s"losing prepare left tmp dirs: ${tmps.toSeq}")
  }

  test("the creation race: two writers both see an absent dataset; " +
      "the loser retries as an upsert into the winner's") {
    val ds = newDs()
    ds.beforeOptimisticCommit = () => {
      ds.beforeOptimisticCommit = () => ()
      ds.write(df(0, 300), opts): Unit
    }
    try ds.writeOptimistic(df(300, 300), opts): Unit
    finally ds.beforeOptimisticCommit = () => ()
    assert(ds.df.count() == 600L)
  }

  test("sustained contention exhausts maxAttempts with the remedy " +
      "named, and every losing prepare's tmp dir is cleaned") {
    val ds = newDs()
    ds.write(df(0, 1000), opts): Unit
    // never disarms: every attempt loses
    ds.beforeOptimisticCommit =
      () => ds.updateKv(Map("bump" -> System.nanoTime().toString))
    val e =
      try intercept[IllegalStateException] {
        ds.writeOptimistic(df(5000, 100), opts, maxAttempts = 3)
      } finally ds.beforeOptimisticCommit = () => ()
    assert(e.getMessage.contains("lost its commit race 3 times") &&
      e.getMessage.contains("lockWaitMs"), e.getMessage)
    assert(e.getCause.isInstanceOf[OrderedDataset.WriteConflictException])
    assert(ds.df.count() == 1000L, "no partial commit from the loser")
    val tmps = new java.io.File(ds.dir).listFiles()
      .filter(f => f.isDirectory &&
        f.getName.startsWith(OrderedDataset.TmpDirPrefix))
    assert(tmps.isEmpty, s"losing prepares left tmp dirs: ${tmps.toSeq}")
  }

  test("two in-JVM threads, disjoint optimistic appends: both land, " +
      "rows exact, generations serialize") {
    val ds = newDs()
    ds.write(df(0, 500), opts): Unit
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = Seq(10000L, 20000L).map { base =>
      new Thread(() => {
        try {
          // fresh handle per thread: the seam and lock tokens are
          // per-instance, as two real writers would be
          new OrderedDataset(spark, ds.dir)
            .writeOptimistic(df(base, 400), opts, maxAttempts = 10): Unit
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join(120000))
    assert(errs.isEmpty, errs.toString)
    assert(ds.df.count() == 1300L)
    assert(ds.df.agg(countDistinct(col("t"))).head().getLong(0) == 1300L)
  }
}
