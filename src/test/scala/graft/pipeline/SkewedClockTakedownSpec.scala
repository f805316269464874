package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Causal tombstone ordering under cross-HOST clock skew (VERDICT r13
  * #2): the supported multi-writer scenario is uncoordinated JVMs on
  * different hosts, where wall clocks disagree. The pre-r14 ordering
  * compared the tombstone's registration ms against the segment dir
  * name's creation ms — a segment written BEFORE a remove but stamped
  * by a fast-running clock read as created-after, the tombstone did
  * not apply, and recalled content stayed servable. Since r14 the
  * order is causal: each segment's kv records the tombstone ledger
  * its writer OBSERVED at creation ([[IndexSegments.TombSeenKey]]);
  * a tombstone the segment did not observe applies to it, whatever
  * any clock said. Proven here with a real second JVM whose clock
  * seam (`-Dgraft.test.clock.skew.ms`) skews the dir-name timestamps
  * a full hour in each direction.
  */
class SkewedClockTakedownSpec extends SparkSpec {
  import spark.implicits._

  /** Launch [[SkewedAddContender]] with the given clock skew; returns
    * its exit code. */
  private def runSkewedAdd(dir: String, lo: Long, hi: Long,
      skewMs: Long): Int = {
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
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
    val cmd = (Seq(javaBin) ++ opens ++ Seq("-Xmx2g",
      s"-Dgraft.test.clock.skew.ms=$skewMs", "-cp",
      System.getProperty("java.class.path"),
      "graft.pipeline.SkewedAddContender", dir, lo.toString,
      hi.toString)).toArray
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    pb.redirectOutput(ProcessBuilder.Redirect.INHERIT)
    val p = pb.start()
    assert(p.waitFor(180, java.util.concurrent.TimeUnit.SECONDS),
      "skewed contender timed out")
    p.exitValue()
  }

  private def probe(dir: String, ids: Long*): Set[Long] =
    DedupIndex.probeDigest(spark, dir,
        SkewedAddContender.mkDocs(spark, 0L, 60L)
          .filter($"doc_id".isin(ids.map(Long.box): _*))
          .select(($"doc_id" + 1000L).as("doc_id"), $"text"),
        "doc_id", "text")
      .select("corpus_id").as[Long].collect().toSet

  test("segment written BEFORE the remove by a fast clock (+1h) still " +
      "loses its removed ids; a re-add AFTER the remove by a slow " +
      "clock (-1h) stays visible; compaction preserves both") {
    val root = tmpDir("skewtd")
    val dir = s"$root/idx"
    DedupIndex.buildDigest(spark, dir,
      SkewedAddContender.mkDocs(spark, 0L, 30L), "doc_id", "text",
      rowsPerFile = 10)
    // a fast-clock host adds docs 30-40 — dir name stamped 1h ahead
    assert(runSkewedAdd(dir, 30L, 40L, skewMs = 3600000L) == 0)
    assert(probe(dir, 5L, 35L, 7L) == Set(5L, 35L, 7L))
    // the remove happens AFTER that segment landed: under the old
    // wall-clock rule the +1h dir name read as created-after and 35
    // leaked; the causal rule applies the tombstone because the
    // segment's kv did not observe it
    assert(DedupIndex.removeDocs(spark, dir,
      Seq(5L, 35L).toDF("doc_id")) == 1)
    assert(probe(dir, 5L, 35L, 7L) == Set(7L),
      "a pre-remove segment from a fast-clock writer must lose its " +
        "removed ids (causal ordering, not wall-clock)")
    // a slow-clock host re-adds doc 35 AFTER the remove — dir name
    // stamped 1h BEHIND the tombstone's; its kv observed the
    // tombstone, so the re-add is visible (the old rule suppressed it)
    assert(runSkewedAdd(dir, 35L, 36L, skewMs = -3600000L) == 0)
    assert(probe(dir, 5L, 35L, 7L) == Set(35L, 7L),
      "a post-remove re-add from a slow-clock writer must be visible")
    // the physical purge folds the same view
    assert(DedupIndex.compactIndex(spark, dir) >= 1)
    assert(probe(dir, 5L, 35L, 7L) == Set(35L, 7L))
  }
}
