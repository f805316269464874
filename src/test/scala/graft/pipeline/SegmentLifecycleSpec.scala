package graft.pipeline

import graft.SparkSpec
import graft.store.{NRows, OrderedDataset, WriteOpts}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-13 segment-lifecycle hardening (ADVICE r12):
  *  - vacuum must not reap an IN-FLIGHT add's segment dir (fresh write
  *    lock inside), only crashed ones (stale/absent lock);
  *  - fold timestamps are durable in the base kv, so the reader grace
  *    window survives filesystems that ignore `setTimes`;
  *  - a stale per-part contamination bloom has a targeted repair;
  *  - an add's kv scalar bump outwaits a compaction's long lock hold.
  */
class SegmentLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(lo: Long, hi: Long): DataFrame =
    (lo until hi).map(i => (i, s"doc $i words w${i % 5} tail t$i"))
      .toDF("doc_id", "text")

  private def segDirs(dir: String): Seq[String] = {
    val d = new java.io.File(dir)
    if (!d.isDirectory) Nil
    else d.listFiles().filter(f => f.isDirectory &&
      f.getName.startsWith(IndexSegments.DeltaPrefix)).map(_.getName).toSeq
  }

  test("vacuum spares an in-flight add's uncommitted segment (fresh " +
      "write lock) through a concurrent compact+vacuum; the add then " +
      "commits and probes correctly; a STALE-locked crash dir is reaped") {
    val dir = tmpDir("vac_live") + "/idx"
    DedupIndex.buildDigest(spark, dir, corpus(0L, 20L), "doc_id", "text",
      rowsPerFile = 10)
    DedupIndex.buildDigest(spark, dir, corpus(20L, 30L), "doc_id", "text",
      rowsPerFile = 10)
    assert(segDirs(dir).size == 1)
    // simulate an in-flight add mid-prepare: its segment dir exists
    // with the writer's lock (heartbeat-fresh) and staged tmp output,
    // but no committed sidecar yet. The dir's own mtime is made OLD —
    // exactly the long-prepare shape ADVICE r12 described.
    val inflight = IndexSegments.newSegmentDir(dir)
    val inflightName = inflight.split('/').last
    val f = new java.io.File(inflight)
    assert(f.mkdirs())
    val lock = new java.io.File(f, OrderedDataset.LockName)
    java.nio.file.Files.writeString(lock.toPath, "pid@host:test")
    val staged = new java.io.File(f, OrderedDataset.TmpDirPrefix + "x")
    assert(staged.mkdirs())
    val old = System.currentTimeMillis() - 3600000L
    assert(f.setLastModified(old))
    assert(staged.setLastModified(old))
    // concurrent compact (folds the one COMMITTED segment; compaction
    // must ignore the sidecar-less dir) + zero-grace vacuum
    assert(DedupIndex.compactIndex(spark, dir) == 1)
    assert(IndexSegments.vacuum(spark, dir, olderThanMs = 0L) == 1,
      "only the folded dir should be reaped")
    assert(new java.io.File(inflight).isDirectory,
      "in-flight segment dir with a fresh lock must survive vacuum")
    // the stalled writer now completes: release the simulated lock and
    // land the real segment write into the SAME dir, then probe
    assert(lock.delete())
    assert(staged.delete())
    new OrderedDataset(spark, inflight).write(
      corpus(30L, 35L).select(
        DedupIndex.hkey60(md5($"text")).as("hkey"),
        md5($"text").as("digest"), $"doc_id".cast("long").as("id")),
      WriteOpts("hkey", NRows(10L),
        duplicatesOn = Some(Seq("digest", "id")),
        kv = Map("graft.index.kind" -> "digest"))): Unit
    val batch = corpus(0L, 35L).filter($"doc_id".isin(5L, 25L, 32L))
      .select(($"doc_id" + 1000L).as("doc_id"), $"text")
    val got = DedupIndex.probeDigest(spark, dir, batch, "doc_id", "text")
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1005L, 5L), (1025L, 25L), (1032L, 32L)))
    // a CRASHED add (same shape, lock gone stale) is reaped
    val crashed = IndexSegments.newSegmentDir(dir)
    val cf = new java.io.File(crashed)
    assert(cf.mkdirs())
    val clock = new java.io.File(cf, OrderedDataset.LockName)
    java.nio.file.Files.writeString(clock.toPath, "pid@host:crashed")
    assert(cf.setLastModified(old))
    assert(clock.setLastModified(old)) // stale: several missed heartbeats
    assert(IndexSegments.vacuum(spark, dir, olderThanMs = 0L) == 1)
    assert(!cf.exists())
    assert(new java.io.File(inflight).isDirectory,
      s"committed segment $inflightName must never be vacuumed")
  }

  test("fold timestamps are durable in the base kv: an OLD folded-dir " +
      "mtime (setTimes ignored) does not shrink the reader grace window") {
    val dir = tmpDir("vac_durable") + "/idx"
    DedupIndex.buildDigest(spark, dir, corpus(0L, 20L), "doc_id", "text",
      rowsPerFile = 10)
    DedupIndex.buildDigest(spark, dir, corpus(20L, 30L), "doc_id", "text",
      rowsPerFile = 10)
    val seg = segDirs(dir).head
    assert(DedupIndex.compactIndex(spark, dir) == 1)
    // the fold is recorded durably, in the same sidecar swap
    val kv = new OrderedDataset(spark, dir).kv
    assert(kv(IndexSegments.FoldedKey).contains(seg))
    assert(kv(IndexSegments.FoldedAtKey).contains(seg + "="))
    // simulate a filesystem that ignored the best-effort setTimes: the
    // folded dir looks an hour old, but the kv fold time is NOW — a
    // 30-minute grace window must still protect it
    assert(new java.io.File(s"$dir/$seg")
      .setLastModified(System.currentTimeMillis() - 3600000L))
    assert(IndexSegments.vacuum(spark, dir,
      olderThanMs = 1800000L) == 0)
    assert(new java.io.File(s"$dir/$seg").isDirectory)
    // past the (zero) window it reaps, and the NEXT fold prunes the
    // stale bookkeeping entries
    assert(IndexSegments.vacuum(spark, dir, olderThanMs = -1L) == 1)
    DedupIndex.buildDigest(spark, dir, corpus(30L, 35L), "doc_id", "text",
      rowsPerFile = 10)
    assert(DedupIndex.compactIndex(spark, dir) == 1)
    val kv2 = new OrderedDataset(spark, dir).kv
    assert(!kv2(IndexSegments.FoldedKey).contains(seg))
    assert(!kv2(IndexSegments.FoldedAtKey).contains(seg))
  }

  test("repairBlooms re-derives exactly the stale parts' blooms; the " +
      "probe is correct before (prefilter disabled, loudly) and after") {
    val train = (0L until 30L).map(i =>
      (i, s"train doc $i words w${i % 7} filler f$i g$i h$i"))
      .toDF("doc_id", "text")
    val evalA = Seq((900L, "train doc 3 words w3 w3")).toDF("doc_id", "text")
    val evalB = Seq((901L, "doc 7 words w0 too here")).toDF("doc_id", "text")
    val dir = tmpDir("bloom_repair") + "/idx"
    ContaminationOps.buildIndex(spark, dir, evalA, "doc_id", "text", 3,
      rowsPerFile = 50)
    ContaminationOps.buildIndex(spark, dir, evalB, "doc_id", "text", 3,
      rowsPerFile = 50)
    val expect = ContaminationOps
      .overlap(train, evalA.unionByName(evalB), "doc_id", "text", 3)
      .as[(Long, Long)].collect().toMap
    def probe() = ContaminationOps
      .probeIndex(spark, dir, train, "doc_id", "text", 3)
      .as[(Long, Long)].collect().toMap
    assert(probe() == expect)
    // crash shape: the segment committed its grams but lost its bloom
    val segBloom = new java.io.File(
      s"$dir/${segDirs(dir).head}", "_bloom")
    assert(segBloom.delete())
    assert(probe() == expect, "a missing part bloom must only disable " +
      "the prefilter, never drop overlaps")
    // targeted repair touches exactly the one stale part
    assert(ContaminationOps.repairBlooms(spark, dir) == 1)
    assert(segBloom.exists())
    assert(ContaminationOps.repairBlooms(spark, dir) == 0) // idempotent
    assert(probe() == expect)
    // opt-in AUTO-repair (VERDICT r13 #6): ONE degraded probe builds
    // the missing bloom in memory, answers identically, and publishes
    // it — the next probe's prefilter is active again with no manual
    // repairBlooms call
    assert(segBloom.delete())
    assert(ContaminationOps.probeIndex(spark, dir, train, "doc_id",
        "text", 3, autoRepair = true)
      .as[(Long, Long)].collect().toMap == expect)
    assert(segBloom.exists(), "autoRepair must publish the bloom")
    assert(ContaminationOps.repairBlooms(spark, dir) == 0,
      "the auto-published bloom must carry a current generation tag")
    assert(probe() == expect)
  }

  test("over-cap probes take the zone-pruned mid tier: identical " +
      "results to the driver-point path, opening a fraction of the " +
      "union's files") {
    val dir = tmpDir("mid_tier") + "/idx"
    // many small files so pruning is observable
    DedupIndex.buildDigest(spark, dir, corpus(0L, 200L), "doc_id", "text",
      rowsPerFile = 10)
    DedupIndex.buildDigest(spark, dir, corpus(200L, 260L), "doc_id",
      "text", rowsPerFile = 10)
    val batch = corpus(0L, 260L).filter($"doc_id".isin(3L, 111L, 222L))
      .select(($"doc_id" + 1000L).as("doc_id"), $"text")
    def probe(mdk: Int) = DedupIndex.probeDigest(spark, dir, batch,
        "doc_id", "text", maxDriverKeys = mdk)
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    val under = probe(65536)
    val statsUnder = IndexSegments.lastProbeStats.get()
    assert(statsUnder.tier == "driver_points")
    assert(under == Set((1003L, 3L), (1111L, 111L), (1222L, 222L)))
    // maxDriverKeys = 0 forces the over-cap dispatch with a tiny key
    // set — the mid tier must open only the keys' covering files
    assert(probe(0) == under)
    val stats = IndexSegments.lastProbeStats.get()
    assert(stats.tier == "zone_pruned", s"got $stats")
    assert(stats.filesTotal >= 20, s"fixture too small: $stats")
    assert(stats.filesOpened <= 6 && stats.filesOpened >= 1,
      s"3 probe keys over ${stats.filesTotal} files opened " +
        s"${stats.filesOpened}")
    // under-cap stats agree with the mid tier on what a key costs
    assert(statsUnder.filesOpened == stats.filesOpened)
  }

  test("opt-in maxSegments self-bounds read amplification: N " +
      "sequential adds never leave more than maxSegments live " +
      "segments, and results match throughout") {
    // digest (presence fold) under maxSegments = 2
    val dgDir = tmpDir("auto_fold_dg") + "/idx"
    for (i <- 0 until 6) {
      DedupIndex.buildDigest(spark, dgDir, corpus(i * 10L, i * 10L + 10L),
        "doc_id", "text", rowsPerFile = 20, maxSegments = Some(2))
      assert(IndexSegments.liveParts(spark, dgDir).size - 1 <= 2,
        s"after add ${i + 1}")
    }
    val batch = corpus(0L, 60L).filter($"doc_id".isin(7L, 33L, 58L))
      .select(($"doc_id" + 1000L).as("doc_id"), $"text")
    assert(DedupIndex.probeDigest(spark, dgDir, batch, "doc_id", "text")
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet ==
      Set((1007L, 7L), (1033L, 33L), (1058L, 58L)))
    // spans (count fold — exercises the single-read replaceAll path)
    // under maxSegments = 3, against a one-shot reference
    val spDir = tmpDir("auto_fold_sp") + "/idx"
    val fullDir = tmpDir("auto_fold_sp_full") + "/idx"
    val chunks = (0 until 5).map(i =>
      (0 until 4).map(j => (i * 4L + j,
        s"shared lead p q r s t u tail c${i}x$j extra words here"))
        .toDF("doc_id", "text"))
    DedupIndex.buildSpanGrams(spark, fullDir,
      chunks.reduce(_ unionByName _), "doc_id", "text", k = 4,
      rowsPerFile = 100)
    chunks.foreach { c =>
      DedupIndex.buildSpanGrams(spark, spDir, c, "doc_id", "text", k = 4,
        rowsPerFile = 100, maxSegments = Some(3))
      assert(IndexSegments.liveParts(spark, spDir).size - 1 <= 3)
    }
    val probeBatch = Seq((100L, "z p q r s t u w")).toDF("doc_id", "text")
    def spans(d: String) = DedupIndex.dedupBatchSpans(spark, d,
        probeBatch, "doc_id", "text", k = 4)
      .as[(Long, Long, Long, Long, String)].collect().toSet
    assert(spans(spDir) == spans(fullDir))
  }

  test("an add's kv scalar bump outwaits a lock hold longer than the " +
      "default transformKv budget (the compaction-fold race)") {
    val dir = tmpDir("kv_outwait") + "/idx"
    Bm25Index.build(spark, dir, corpus(0L, 10L), "doc_id", "text", 8)
    val ds = new OrderedDataset(spark, dir)
    // hold the base write lock ~12 s (> CommitWaitMs = 10 s), the shape
    // of a fold's Spark job; writeGuarded runs its guard INSIDE the lock
    val holder = new Thread(() => {
      ds.writeGuarded(
        corpus(100L, 101L).select(
          DedupIndex.hkey60(md5($"text")).as("hkey"), $"text".as("term"),
          $"doc_id".as("id"), lit(1L).as("tf"), lit(5L).as("dl")),
        WriteOpts("hkey", NRows(1000L),
          duplicatesOn = Some(Seq("term", "id")))) {
        Thread.sleep(12000L)
      }: Unit
    })
    holder.start()
    Thread.sleep(500L) // let the holder acquire the lock first
    // the add lands its segment and QUEUES its bump past the hold
    // instead of throwing after the data committed (ADVICE r12)
    val n0 = ds.kv("graft.bm25.n_docs").toLong
    Bm25Index.add(spark, dir, corpus(10L, 15L), "doc_id", "text", 8)
    holder.join()
    assert(new OrderedDataset(spark, dir)
      .kv("graft.bm25.n_docs").toLong == n0 + 5L)
  }
}
