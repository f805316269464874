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

  /** A writer killed mid-commit leaves three kinds of debris: its
    * (now heartbeat-less) lock, a partial `_tmp_write-*` job dir, and
    * committed-but-never-referenced data files at ids ≥ nextFileId.
    * The contract: readers never notice (they plan from the sidecar
    * alone), and the NEXT writer breaks the stale lock, sweeps the
    * orphans, and commits — leaving a readable, consistent generation
    * chain with no manual intervention.
    */
  test("dead writer mid-commit: stale lock broken, orphans swept") {
    import spark.implicits._
    val dir = tmpDir("deadwriter") + "/ds"
    val ds = new OrderedDataset(spark, dir)
    ds.write(spark.range(0, 100).toDF("seq").withColumn("v", lit(0.0)),
      WriteOpts("seq", NRows(50)))
    val g1 = ds.meta.generation
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(n: String) = new org.apache.hadoop.fs.Path(dir, n)
    // 1. the dead writer's lock: present, token nobody holds, mtime
    //    past the staleness horizon (its heartbeat died with it)
    val lock = fs.create(p(OrderedDataset.LockName), true)
    lock.write("dead-writer@gone:0000".getBytes("UTF-8")); lock.close()
    fs.setTimes(p(OrderedDataset.LockName),
      System.currentTimeMillis() - OrderedDataset.LockStaleMs - 60000L, -1)
    // 2. its partial Spark job dir
    fs.mkdirs(p(OrderedDataset.TmpDirPrefix + "deadbeef"))
    val junk = fs.create(p(OrderedDataset.TmpDirPrefix + "deadbeef/part-0"),
      true)
    junk.write(Array.fill(64)(7.toByte)); junk.close()
    // like the lock, the dead writer's job dir is STALE (no writes
    // since the crash): backdate past the grace window — a FRESH tmp
    // dir is a live optimistic preparer's and must survive the sweep
    fs.setTimes(p(OrderedDataset.TmpDirPrefix + "deadbeef"),
      System.currentTimeMillis() - OrderedDataset.retireGraceMs - 60000L,
      -1)
    // 3. a data file it wrote but never published (id >= nextFileId)
    val orphanName = f"f${ds.meta.nextFileId + 7}%08d.parquet"
    val someData = ds.meta.files.head.name
    org.apache.hadoop.fs.FileUtil.copy(fs, p(someData), fs, p(orphanName),
      false, spark.sparkContext.hadoopConfiguration)
    // readers are oblivious to all of it
    assert(ds.df.count() === 100)
    assert(ds.meta.generation === g1)
    // the next writer queues 0 ms on the STALE lock (it is broken, not
    // waited out), sweeps, and commits
    val t0 = System.currentTimeMillis()
    ds.write(spark.range(100, 150).toDF("seq").withColumn("v", lit(1.0)),
      WriteOpts("seq", NRows(50)))
    assert(System.currentTimeMillis() - t0 < OrderedDataset.LockStaleMs,
      "writer waited on a stale lock instead of breaking it")
    assert(!fs.exists(p(OrderedDataset.TmpDirPrefix + "deadbeef")))
    assert(!fs.exists(p(orphanName)))
    assert(!fs.exists(p(OrderedDataset.LockName))) // released cleanly
    // the chain is consistent and fully readable
    assert(ds.df.count() === 150)
    val gens = ds.generations
    assert(gens.contains(g1))
    assert(ds.dfAsOf(g1).count() === 100)
    ds.restoreTo(g1)
    assert(ds.df.count() === 100)
  }
}
