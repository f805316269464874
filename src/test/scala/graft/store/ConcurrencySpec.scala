package graft.store

import org.apache.spark.sql.functions._
import graft.SparkSpec
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

/** Chaos test of the reader-grace + writer-queue design: concurrent
  * upserts (queued through the lock), repeated range reads, and a
  * mid-run restore must all complete with no exceptions, and the
  * final state must be exactly the union of committed batches.
  * Readers plan against whatever sidecar generation they catch;
  * retired files stay on disk for the grace window, so no read may
  * ever fail or see a torn file list.
  */
class ConcurrencySpec extends SparkSpec {

  test("writers queue, readers never tear, describe stays consistent") {
    import spark.implicits._
    val dir = tmpDir("chaos") + "/ds"
    val ds = new OrderedDataset(spark, dir)
    ds.write(spark.range(0, 100).toDF("seq").withColumn("v", lit(0.0)),
      WriteOpts("seq", NRows(50)))
    val prev = OrderedDataset.lockWaitMs
    OrderedDataset.lockWaitMs = 120000L
    try {
      val pool = Executors.newFixedThreadPool(6)
      val start = new CountDownLatch(1)
      val failures =
        new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      // 3 writers, disjoint key ranges, 3 batches each
      val writers = (0 until 3).map { w =>
        pool.submit(new Runnable {
          def run(): Unit = {
            start.await()
            try (0 until 3).foreach { b =>
              val lo = 1000 + w * 300 + b * 100
              ds.write(spark.range(lo, lo + 100).toDF("seq")
                  .withColumn("v", lit(w * 1.0)),
                WriteOpts("seq", NRows(50))): Unit
            } catch { case t: Throwable => failures.add(t): Unit }
          }
        })
      }
      // 2 readers hammering range scans across the whole key space
      val readers = (0 until 2).map { _ =>
        pool.submit(new Runnable {
          def run(): Unit = {
            start.await()
            try (0 until 12).foreach { _ =>
              val n = ds.rangeDF(Some(OrdLong(0L)), Some(OrdLong(5000L)))
                .count()
              assert(n >= 100, s"reader saw $n rows")
              val info = ds.describe()
              assert(info.totalRows >= 100 && info.nFiles > 0)
            } catch { case t: Throwable => failures.add(t): Unit }
          }
        })
      }
      start.countDown()
      (writers ++ readers).foreach(_.get(180, TimeUnit.SECONDS))
      pool.shutdown()
      assert(failures.isEmpty,
        s"chaos failures: ${failures.toArray.mkString("; ")}")
      // final state: initial 100 + 3 writers x 300 disjoint rows
      assert(ds.df.count() === 1000)
      val info = ds.describe()
      assert(info.totalRows === 1000L)
      assert(info.min.contains(OrdLong(0L)))
      assert(info.max.contains(OrdLong(1899L)))
      assert(info.totalBytes > 0L)
      // a restore mid-history still works after the dust settles
      val gens = ds.generations
      assert(gens.size >= 10) // 1 + 9 writer commits, all retained
      ds.restoreTo(gens(gens.size - 2))
      assert(ds.df.count() === 900)
    } finally OrderedDataset.lockWaitMs = prev
  }

  /** The local FS is a ChecksumFileSystem: FileContext.rename moves
    * `_graftmd.json` and its `.crc` in two steps, so a lock-free
    * reader can catch the new sidecar against the stale checksum.
    * Sidecar.readPath retries that bounded window; this hammers it
    * with rapid sidecar commits against tight read loops — before the
    * retry, this tripped ChecksumException within a few hundred
    * iterations.
    */
  test("sidecar reads survive the rename checksum window") {
    import spark.implicits._
    val dir = tmpDir("mdrace") + "/ds"
    val ds = new OrderedDataset(spark, dir)
    ds.write(spark.range(0, 10).toDF("seq").withColumn("v", lit(0.0)),
      WriteOpts("seq", NRows(50)))
    val pool = Executors.newFixedThreadPool(3)
    val start = new CountDownLatch(1)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failures =
      new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val readers = (0 until 2).map { _ =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          try while (!stop.get()) {
            val m = ds.meta // lock-free Sidecar.read every iteration
            assert(m.files.nonEmpty && m.generation >= 1L)
          } catch { case t: Throwable => failures.add(t): Unit }
        }
      })
    }
    start.countDown()
    // 150 metadata-only commits = 150 copy+rename windows
    try (0 until 150).foreach(i => ds.updateKv(Map("i" -> i.toString)))
    finally stop.set(true)
    readers.foreach(_.get(60, TimeUnit.SECONDS))
    pool.shutdown()
    assert(failures.isEmpty,
      s"reader failures: ${failures.toArray.mkString("; ")}")
    assert(ds.kv("i") === "149")
  }
}
