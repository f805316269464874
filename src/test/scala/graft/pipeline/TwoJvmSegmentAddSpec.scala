package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** The cross-PROCESS delta-segment compose proof: two JVMs sharing
  * only the filesystem run overlapping [[Bm25Index.add]] increments
  * against ONE index — no lock contention is even possible on the
  * data (adds write distinct segment dirs); only the ms-scale scalar
  * RMW serializes. The union index must answer identically to a
  * one-shot build over everything, the corpus scalars must compose
  * exactly, and a fold afterwards must change nothing.
  */
class TwoJvmSegmentAddSpec extends SparkSpec {

  private def spawn(dir: String, lo: Long, hi: Long, nAdds: Int)
      : Process = {
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
    val cmd = (Seq(javaBin) ++ opens ++ Seq("-Xmx2g", "-cp",
      System.getProperty("java.class.path"),
      "graft.pipeline.SegmentAddContender", dir, lo.toString,
      hi.toString, nAdds.toString)).toArray
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    pb.redirectOutput(ProcessBuilder.Redirect.INHERIT)
    pb.start()
  }

  private def topk(dir: String, queries: DataFrame) =
    Bm25Index.topK(spark, dir, queries, 5)
      .orderBy("q_id", "rank").collect().toSeq

  test("two uncoordinated JVMs adding increments to ONE bm25 index: " +
      "all segments land, scalars compose, answers equal a one-shot " +
      "build, and a fold changes nothing") {
    import spark.implicits._
    val root = tmpDir("twojvmsegadd")
    val dir = s"$root/idx"
    def docs(lo: Long, hi: Long) =
      SegmentAddContender.mkDocs(spark, lo, hi)
    Bm25Index.build(spark, dir, docs(0L, 60L), "doc_id", "text", 50)

    val p = spawn(dir, 1000L, 1060L, nAdds = 2)
    try {
      val ready = new java.io.File(root, "segadd_ready")
      val deadline = System.currentTimeMillis() + 120000
      while (!ready.exists() && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(ready.exists(), "contender never signalled ready")
      // fire this JVM's adds into the contender's window
      Bm25Index.add(spark, dir, docs(2000L, 2030L), "doc_id", "text", 50)
      Bm25Index.add(spark, dir, docs(2030L, 2060L), "doc_id", "text", 50)
      assert(p.waitFor(180, java.util.concurrent.TimeUnit.SECONDS),
        "contender did not finish")
      assert(p.exitValue() == 0, "contender failed")
    } finally if (p.isAlive) p.destroyForcibly(): Unit

    // 4 segments (2 per JVM) + base; scalars composed exactly
    assert(IndexSegments.liveParts(spark, dir).size == 5)
    val kv = new graft.store.OrderedDataset(spark, dir).kv
    assert(kv("graft.bm25.n_docs").toLong == 180L)

    val full = s"$root/full"
    Bm25Index.build(spark, full,
      docs(0L, 60L).unionByName(docs(1000L, 1060L))
        .unionByName(docs(2000L, 2060L)), "doc_id", "text", 50)
    val queries = Seq((0L, "tok3 omega"), (1L, "u1005 alpha"),
      (2L, "tok7 u2042")).toDF("q_id", "q_text")
    val expect = topk(full, queries)
    assert(topk(dir, queries) == expect)
    assert(DedupIndex.compactIndex(spark, dir) == 4)
    assert(topk(dir, queries) == expect)
  }
}
