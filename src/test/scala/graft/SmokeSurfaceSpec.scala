package graft

/** Full-surface smoke gate at the tiniest SF (VERDICT r10 #2): every
  * `SparkEntry.queries` entry is constructed AND fully executed at
  * sf0.001, asserting non-erroring, non-empty results.
  *
  * Why this exists: `m8_schema_evolution`'s fixture cut was an
  * absolute `row_id < 5000`, which made the evolved append EMPTY below
  * sf0.01 — the class of bug (fixture constants silently coupled to
  * the SF) was invisible to the sf0.01 correctness gate and to the
  * sf0.1 bench, and surfaced only because a full bench happened to run
  * at sf0.001 (fixed 0b52c8e, LEAST-capped split). This suite makes
  * the tiny SF a standing gate: re-seeding that bug (an absolute
  * row-count constant larger than the sf0.001 table) fails the suite
  * at build time — verified by reverting the LEAST cap locally, which
  * fails `m8_schema_evolution` here with a missing-column error.
  *
  * Execution is a full noop-sink write (same as the bench), not
  * `limit(1)`: a short-circuited probe would skip the partitions where
  * SF-coupled fixtures break. Emptiness is then checked with a cheap
  * `limit(1)` pass. Store/pipeline fixtures self-ensure (marker
  * fast-path), so the steady-state wall cost is the queries
  * themselves — ~75 s at sf0.001 on local[4] (first run on a machine
  * pays the one-time sf0.001 fixture build on top).
  */
class SmokeSurfaceSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"
  private val fixturePresent = new java.io.File(d).isDirectory

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"sf0.001 smoke: $name") {
      assume(fixturePresent, s"fixture dir $d absent on this machine")
      val df =
        try fn(spark, d)
        catch { case e: Throwable =>
          fail(s"$name failed to CONSTRUCT at sf0.001 — likely an " +
            s"SF-coupled fixture constant: ${e.getMessage}", e) }
      try df.write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        fail(s"$name failed to EXECUTE at sf0.001 — likely an " +
          s"SF-coupled fixture constant: ${e.getMessage}", e) }
      assert(df.limit(1).count() == 1L,
        s"$name returned ZERO rows at sf0.001 — an SF-coupled fixture " +
          "constant (absolute row cut, id threshold, …) is the usual " +
          "cause; scale the constant to the input (LEAST/fraction)")
      spark.catalog.clearCache()
    }
  }
}
