package graft.store

import graft.SparkSpec
import org.apache.hadoop.fs.{Path => HPath}

/** CROSS-PROCESS single-writer proof (round-9 verdict stretch task):
  * the store's exclusive write lock is an advisory FILE protocol
  * (atomic create + heartbeat mtime + stale-break, the shape the
  * reference gets from `flufl.lock`, ref base.py:240-255), and
  * ConcurrencySpec exercises it only between threads of one JVM.
  * These tests spawn a REAL second JVM ([[LockContender]], full
  * SparkSession + the public `updateKv` path) against a dataset this
  * JVM owns, pinning the contract where it actually matters — between
  * processes sharing only the filesystem:
  *
  *  - a FRESH foreign lock is honored: the contender fails loudly
  *    with the named error, commits nothing, and does not delete the
  *    owner's lock;
  *  - after release the same contender commits;
  *  - a STALE foreign lock (mtime past LockStaleMs — a crashed
  *    writer) is broken: the contender commits and cleans up after
  *    itself.
  */
class TwoJvmLockSpec extends SparkSpec {
  import spark.implicits._

  private def fs(dir: String) =
    new HPath(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def lockPath(dir: String) =
    new HPath(s"$dir/${OrderedDataset.LockName}")

  /** Foreign lock file exactly as another process's writeLock leaves
    * it on disk: token bytes, fresh (or backdated) mtime.
    */
  private def plantLock(dir: String, ageMs: Long = 0L): Unit = {
    val f = fs(dir)
    val out = f.create(lockPath(dir), false)
    out.write("otherhost-pid-4242:feedface".getBytes("UTF-8"))
    out.close()
    if (ageMs > 0)
      f.setTimes(lockPath(dir), System.currentTimeMillis() - ageMs, -1)
  }

  /** Spawn [[LockContender]] in a separate JVM with this JVM's
    * classpath and module opens; returns (exitCode, combined output).
    */
  private def spawnContender(dir: String): (Int, String) = {
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    // replicate the forked test JVM's --add-opens pairs (Spark on
    // JDK 17 needs them; they arrive as alternating tokens)
    val in = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments
    val opens = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < in.size()) {
      if (in.get(i) == "--add-opens" && i + 1 < in.size()) {
        opens += "--add-opens" += in.get(i + 1); i += 2
      } else if (in.get(i).startsWith("--add-opens=")) {
        opens += in.get(i); i += 1
      } else i += 1
    }
    val cmd = (Seq(javaBin) ++ opens ++ Seq("-Xmx2g", "-cp",
      System.getProperty("java.class.path"),
      "graft.store.LockContender", dir)).toArray
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val outBuf = new java.io.ByteArrayOutputStream()
    val pump = new Thread(() => {
      val b = new Array[Byte](8192)
      var n = p.getInputStream.read(b)
      while (n >= 0) { outBuf.write(b, 0, n); n = p.getInputStream.read(b) }
    })
    pump.setDaemon(true); pump.start()
    val done = p.waitFor(180, java.util.concurrent.TimeUnit.SECONDS)
    if (!done) { p.destroyForcibly(); fail("contender JVM hung >180s") }
    pump.join(5000)
    (p.exitValue(), outBuf.toString("UTF-8"))
  }

  test("a fresh lock held by ANOTHER PROCESS is honored (loud refusal, " +
      "nothing committed, owner's lock intact); after release the same " +
      "contender commits") {
    val dir = s"${tmpDir("twojvm")}/ds"
    val ds = new OrderedDataset(spark, dir)
    ds.write(Seq((1L, 1.0), (2L, 2.0)).toDF("t", "v"),
      WriteOpts("t", NRows(10)))
    val kvBefore = ds.meta.kv
    val genBefore = ds.meta.generation

    plantLock(dir) // fresh mtime = a healthy writer mid-commit
    val (code1, out1) = spawnContender(dir)
    assert(code1 == 3,
      s"contender must refuse a fresh foreign lock (exit 3), got " +
        s"$code1:\n${out1.linesIterator.take(20).mkString("\n")}")
    assert(out1.contains("locked by another writer"), out1.take(2000))
    // nothing committed, and the OWNER's live lock was not deleted
    assert(ds.meta.kv == kvBefore && ds.meta.generation == genBefore,
      "a refused writer must commit nothing")
    assert(fs(dir).exists(lockPath(dir)),
      "the contender must not delete a fresh foreign lock")

    // owner releases → the identical attempt commits
    fs(dir).delete(lockPath(dir), false)
    val (code2, out2) = spawnContender(dir)
    assert(code2 == 0, s"contender must commit after release, got " +
      s"$code2:\n${out2.linesIterator.take(20).mkString("\n")}")
    assert(ds.meta.kv.get("contender").contains("won"))
    assert(!fs(dir).exists(lockPath(dir)),
      "the winning writer must remove its own lock")
    // the dataset is uncorrupted: rows and order intact
    assert(ds.df.count() == 2L)
  }

  test("a STALE foreign lock (crashed writer, mtime past LockStaleMs) " +
      "is broken by a second process, which then commits cleanly") {
    val dir = s"${tmpDir("twojvm")}/stale"
    val ds = new OrderedDataset(spark, dir)
    ds.write(Seq((1L, 1.0)).toDF("t", "v"), WriteOpts("t", NRows(10)))
    plantLock(dir, ageMs = OrderedDataset.LockStaleMs + 60000L)
    val (code, out) = spawnContender(dir)
    assert(code == 0, s"contender must break a stale lock and commit, " +
      s"got $code:\n${out.linesIterator.take(20).mkString("\n")}")
    assert(ds.meta.kv.get("contender").contains("won"))
    assert(!fs(dir).exists(lockPath(dir)))
    assert(ds.df.count() == 1L)
  }
}
