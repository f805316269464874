package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.columnar.InMemoryRelation

/** Plan-shape pin for the composed curation pipeline (PLANS.md r10):
  * the cross-stage discipline `p_pipeline_e2e` exists to prove — no
  * stage rescans the corpus — must survive refactors as a FAILING
  * TEST, not an audit paragraph. The pin: at the top level of the
  * final optimized plan, parquet is read exactly ONCE (the held-out
  * eval split of `documents` feeding the decontamination grams), and
  * every other input arrives through ONE cached stage boundary (the
  * post-near-dup survivor set, referenced by both the contamination
  * anti-join and the final pack). The upstream boundaries (post-dedup
  * survivors, the survivor-vector cache) live inside that cache's
  * own build plan — a dropped `.persist()` anywhere surfaces here as
  * extra top-level relations or extra distinct caches.
  */
class PipelineE2eShapeSpec extends SparkSpec {

  test("p_pipeline_e2e top-level plan: one parquet read (the eval " +
      "split), one cached stage boundary referenced twice") {
    val d = "/root/testdata/sf0.001"
    // portable skip, not a failure, when the driver fixture tree is
    // absent (ADVICE r10) — the pin is about plan shape, not data
    assume(new java.io.File(d).isDirectory,
      s"fixture dir $d absent on this machine")
    try {
      val df = graft.SparkEntry.queries("p_pipeline_e2e")(spark, d)
      val lp = df.queryExecution.optimizedPlan
      val rels = lp.collect { case r: LogicalRelation => r }
      val paths = rels.map(_.relation.asInstanceOf[HadoopFsRelation]
        .location.rootPaths.map(_.toString).mkString(","))
      assert(rels.size == 1,
        s"expected exactly 1 top-level parquet relation (the eval " +
          s"split), got ${rels.size}: $paths — a stage is rescanning " +
          "the corpus instead of reading its upstream cache")
      assert(paths.head.contains("documents.parquet"),
        s"the one top-level read must be the documents eval split: " +
          paths.head)
      val caches = lp.collect { case c: InMemoryRelation => c }
      // reference identity (eq), not identityHashCode: hash values can
      // collide for distinct builders and wrongly pass (ADVICE r10)
      val distinctCaches = caches.map(_.cacheBuilder)
        .foldLeft(List.empty[AnyRef]) { (acc, b) =>
          if (acc.exists(_ eq b)) acc else b :: acc }
      assert(caches.size == 2 && distinctCaches.size == 1,
        s"expected the ONE post-near-dup boundary cache referenced " +
          s"twice (contamination + pack), got ${caches.size} refs to " +
          s"${distinctCaches.size} caches")
      // and the chain actually runs end to end on the tiny SF
      assert(df.limit(1).count() == 1L, "composed pipeline emitted no rows")
    } finally spark.catalog.clearCache()
  }
}
