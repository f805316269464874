package graft.pipeline

import graft.SparkSpec
import graft.store.{OrdLong, OrderedDataset}
import org.apache.spark.sql.functions._

/** The over-cap dispatch's tier gate must read the KEYSPACE, not the
  * scheduler (VERDICT r13 #2 "what's wrong" finding): the gate samples
  * probe keys to estimate file coverage, and a prefix-of-partitions
  * sample can read "clustered" on a batch whose early partitions are
  * key-clustered while the full set is uniform — engaging the pruning
  * tier and re-paying exactly the full-lineage pass the gate exists to
  * avoid. The sample must therefore be spread over the keyspace
  * (hash-strided), immune to the physical partition order of the
  * probe-key frame.
  */
class OverCapSampleSpec extends SparkSpec {
  import spark.implicits._

  test("a probe-key frame whose FIRST partitions are clustered but " +
      "whose full keyspace is uniform reads full_union; a genuinely " +
      "clustered set still engages the zone-pruned tier") {
    val dir = tmpDir("overcap_bias") + "/idx"
    val corpus = (0L until 300L).map(i =>
      (i, s"doc $i words w${i % 5} tail t$i")).toDF("doc_id", "text")
    DedupIndex.buildDigest(spark, dir, corpus, "doc_id", "text",
      rowsPerFile = 10)
    val parts = IndexSegments.liveParts(spark, dir)
    val files = parts.head.m.files
    assert(files.size >= 20, s"fixture too small: ${files.size} files")
    def lo(i: Int) = files(i).min.asInstanceOf[OrdLong].v
    def hi(i: Int) = files(i).max.asInstanceOf[OrdLong].v
    // clustered keys: all inside file 0's range
    val clustered = (0 until 40).map(j =>
      lo(0) + (hi(0) - lo(0)) * j / 40)
    // uniform keys: one per file, spanning the whole keyspace
    val uniform = files.indices.map(i => (lo(i) + hi(i)) / 2)
    // partition 0 holds ONLY clustered keys; the rest are uniform —
    // the layout a prefix-of-partitions sample misreads
    val biased = spark.sparkContext
      .parallelize(clustered ++ uniform ++ uniform, 8).toDF("hkey")
    val cap = 8 // well under both key sets
    IndexSegments.scanForProbes(parts, biased, cap).collect(): Unit
    val stats = IndexSegments.lastProbeStats.get()
    assert(stats.tier == "full_union",
      s"uniform keyspace behind a clustered partition prefix must " +
        s"skip the pruning tier, got $stats")
    // a genuinely clustered over-cap set still prunes
    val dense = spark.sparkContext.parallelize(clustered, 4).toDF("hkey")
    val got = IndexSegments.scanForProbes(parts, dense, cap)
      .select("id").as[Long].collect().toSet
    val stats2 = IndexSegments.lastProbeStats.get()
    assert(stats2.tier == "zone_pruned", s"got $stats2")
    assert(stats2.filesOpened < stats2.filesTotal / 2,
      s"clustered keys should open a fraction of files: $stats2")
    // and the pruned scan is sound: it returns whole files, so every
    // row whose key the probe set covers (file 0's range) is present
    val file0Ids = parts.head.ds.dfOf(parts.head.m)
      .filter(col("hkey").between(lo(0), hi(0)))
      .select("id").as[Long].collect().toSet
    assert(file0Ids.nonEmpty && file0Ids.subsetOf(got),
      s"rows covered by the probed range must be in the pruned scan")
  }
}
