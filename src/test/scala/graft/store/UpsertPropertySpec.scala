package graft.store

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests of the upsert contract (SURVEY §5 port implication):
  * however an ordered dataset is assembled — one batch, many batches,
  * overlapping corrections, repeated writes — the final content equals
  * the relational keep-last-dedup of the concatenated batches, and
  * upserts are idempotent. Generators are driven directly (fixed seeds,
  * deterministic) — no scalatest-scalacheck bridge needed.
  */
class UpsertPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  /** One batch: sorted keys (with duplicates) and a value tag. */
  val batchGen: Gen[Seq[(Long, Double)]] = for {
    n <- Gen.choose(1, 40)
    keys <- Gen.listOfN(n, Gen.choose(0L, 60L))
    tag <- Gen.choose(0, 1000)
  } yield keys.sorted.zipWithIndex.map { case (k, i) =>
    (k, tag * 1000.0 + i)
  }

  val scenarioGen: Gen[(List[Seq[(Long, Double)]], Long, Option[Int])] = for {
    batches <- Gen.choose(1, 5).flatMap(Gen.listOfN(_, batchGen))
    target <- Gen.choose(5L, 25L)
    maxOff <- Gen.oneOf(None, Some(2))
  } yield (batches, target, maxOff)

  def toDf(b: Seq[(Long, Double)]): DataFrame =
    b.toDF("t", "v").coalesce(1)

  /** Reference model: keep-last on t over the concatenation, in batch
    * order then intra-batch order.
    */
  def model(batches: Seq[Seq[(Long, Double)]]): Seq[(Long, Double)] =
    batches.flatten.zipWithIndex
      .groupBy(_._1._1).view
      .mapValues(_.maxBy(_._2)._1._2)
      .toSeq.sortBy(_._1)

  test("any sequence of ordered upserts equals keep-last of the concat") {
    (1 to 10).foreach { i =>
      val (batches, target, maxOff) = sample(scenarioGen, 1000L + i)
      val dir = tmpDir("prop")
      val ds = new OrderedDataset(spark, s"$dir/d")
      val opts = WriteOpts("t", NRows(target),
        duplicatesOn = Some(Seq("t")), maxNOffTargetRgs = maxOff,
        sketchCols = Seq("t"))
      batches.foreach(b => ds.write(toDf(b), opts))
      val got = ds.orderedDf.as[(Long, Double)].collect().toSeq
      val exp = model(batches)
      assert(got == exp, s"\nseed=${1000 + i} batches=$batches target=$target")
      // sidecar stats are exact and files non-overlapping (t is unique
      // after keep-last dedup, so boundaries cannot even touch)
      val m = ds.meta
      assert(m.totalRows == exp.size)
      m.files.foreach(f => assert(f.min <= f.max))
      m.files.sliding(2).foreach {
        case Seq(a, b) => assert(a.max < b.min,
          s"overlapping files: $a / $b")
        case _ =>
      }
      // sketch continuity through any rewrite interleaving: every live
      // file is sketched, and with << 2^12 distinct keys the HLL union
      // is EXACT (t is unique after keep-last, so NDV = row count)
      assert(m.files.forall(_.hll.contains("t")))
      if (exp.nonEmpty)
        assert(ds.approxDistinct("t") == exp.size.toLong,
          s"seed=${1000 + i} sketch NDV drifted")
    }
  }

  /** Interleaved upserts and range deletes must equal the same
    * operations applied to a sorted-map model, with the zone-map
    * invariants (exact stats, non-overlapping files) preserved at
    * every step — the delete analog of the upsert property above.
    */
  test("interleaved upserts and range deletes track the model") {
    val opGen: Gen[Either[Seq[(Long, Double)], (Long, Long)]] = Gen.frequency(
      3 -> batchGen.map(Left(_)),
      2 -> (for {
        lo <- Gen.choose(0L, 60L)
        w <- Gen.choose(1L, 30L)
      } yield Right((lo, lo + w))))
    val runGen: Gen[(List[Either[Seq[(Long, Double)], (Long, Long)]], Long)] =
      for {
        ops <- Gen.choose(3, 8).flatMap(Gen.listOfN(_, opGen))
        target <- Gen.choose(5L, 25L)
      } yield (ops, target)

    (1 to 10).foreach { i =>
      val (ops, target) = sample(runGen, 7000L + i)
      val dir = tmpDir("delprop")
      val ds = new OrderedDataset(spark, s"$dir/d")
      val opts = WriteOpts("t", NRows(target), duplicatesOn = Some(Seq("t")))
      var model = Map.empty[Long, Double]
      var wrote = false
      ops.foreach {
        case Left(batch) =>
          ds.write(toDf(batch), opts)
          batch.foreach { case (k, v) => model += (k -> v) }
          wrote = true
        case Right((lo, hi)) if wrote =>
          ds.delete(Some(OrdLong(lo)), Some(OrdLong(hi)))
          model = model.filter { case (k, _) => k < lo || k >= hi }
        case Right(_) => () // delete before any write: nothing to do
      }
      if (wrote) {
        val got = ds.orderedDf.as[(Long, Double)].collect().toSeq
        val exp = model.toSeq.sortBy(_._1)
        assert(got == exp, s"\nseed=${7000 + i} ops=$ops target=$target")
        val m = ds.meta
        assert(m.totalRows == exp.size)
        m.files.foreach(f => assert(f.min <= f.max))
        m.files.sliding(2).foreach {
          case Seq(a, b) => assert(a.max < b.min,
            s"overlapping files: $a / $b")
          case _ =>
        }
        // boundary stats stay EXACT through deletes (a rewrite that
        // kept pre-delete mins/maxs would mis-prune range reads)
        if (exp.nonEmpty) {
          assert(m.files.head.min == OrdLong(exp.head._1))
          assert(m.files.last.max == OrdLong(exp.last._1))
        } else assert(m.files.isEmpty)
      }
    }
  }

  test("TimePeriod upserts: content keeps-last, EXACTLY one file/day") {
    val t0 = java.time.LocalDateTime.of(2024, 4, 1, 0, 0)
    val tsBatchGen: Gen[Seq[(Long, Double)]] = for {
      n <- Gen.choose(1, 50)
      mins <- Gen.listOfN(n, Gen.choose(0L, 5L * 1440 - 1)) // 5 days
      tag <- Gen.choose(0, 1000)
    } yield mins.sorted.zipWithIndex.map { case (m, i) =>
      (m, tag * 1000.0 + i)
    }
    (1 to 6).foreach { i =>
      val batches = sample(
        Gen.choose(1, 4).flatMap(Gen.listOfN(_, tsBatchGen)), 3000L + i)
      val dir = tmpDir("period-prop")
      val ds = new OrderedDataset(spark, s"$dir/d")
      val opts = WriteOpts("t", TimePeriod("day"),
        duplicatesOn = Some(Seq("t")))
      batches.foreach { b =>
        ds.write(b.map { case (m, v) => (t0.plusMinutes(m), v) }
          .toDF("t", "v").coalesce(1), opts)
      }
      val got = ds.orderedDf
        .as[(java.time.LocalDateTime, Double)].collect().toSeq
        .map { case (t, v) =>
          (java.time.Duration.between(t0, t).toMinutes, v) }
      val exp = model(batches)
      assert(got == exp, s"seed=${3000 + i}")
      // exactly one file per day present in the data, none spanning
      val m = ds.meta
      val days = exp.map(_._1 / 1440).distinct.size
      assert(m.files.size == days, s"seed=${3000 + i} files=${m.files}")
      m.files.foreach { f =>
        (f.min, f.max) match {
          case (OrdTs(a), OrdTs(b)) =>
            assert(a / 86400000000L == b / 86400000000L,
              s"seed=${3000 + i} file spans days: $f")
          case other => fail(s"unexpected stats $other")
        }
      }
    }
  }

  test("TimePeriod middle insert with no range overlap stays one file/day") {
    // ADVICE r2 repro: 5 one-day files, then one row INSIDE day 1 but
    // strictly after that file's max — no value-range overlap with any
    // file, so the planner's pure-insert branch must aim the period
    // fixpoint at the true neighbors, not the tail.
    val t0 = java.time.LocalDateTime.of(2024, 4, 1, 0, 0)
    val dir = tmpDir("period-middle")
    val ds = new OrderedDataset(spark, s"$dir/d")
    val opts = WriteOpts("t", TimePeriod("day"), duplicatesOn = Some(Seq("t")))
    val days = (0 until 5).flatMap { d =>
      Seq((t0.plusDays(d), d * 10.0), (t0.plusDays(d).plusHours(12), d * 10.0 + 1))
    }
    ds.write(days.toDF("t", "v").coalesce(1), opts)
    assert(ds.meta.files.size == 5, ds.meta.files)
    ds.write(Seq((t0.plusDays(1).plusHours(18), 99.0)).toDF("t", "v"), opts)
    assert(ds.meta.files.size == 5,
      s"middle insert split a period: ${ds.meta.files}")
    assert(ds.orderedDf.count() == 11)
  }

  test("re-upserting the same batch is idempotent") {
    (1 to 6).foreach { i =>
      val b = sample(batchGen, 2000L + i)
      val dir = tmpDir("idem")
      val ds = new OrderedDataset(spark, s"$dir/d")
      val opts = WriteOpts("t", NRows(10), duplicatesOn = Some(Seq("t")))
      ds.write(toDf(b), opts)
      val first = ds.orderedDf.as[(Long, Double)].collect().toSeq
      ds.write(toDf(b), opts)
      val second = ds.orderedDf.as[(Long, Double)].collect().toSeq
      assert(first == second, s"seed=${2000 + i}")
    }
  }

  /** The AggStream equivalence as a property: random chunkings of a
    * random seed all converge to the same bins.
    */
  test("incremental aggregation is chunking-invariant (property)") {
    import graft.agg.{AggFn, AggSpec}
    import graft.stream.{AggStream, StreamKeyCfg}
    import org.apache.spark.sql.functions.col
    implicit val ord: Ordering[String] = Ordering.String
    val idx = Indexer.of[String](1)(k => Seq(Seq(k)))(l =>
      if (l.head.size == 1) Some(l.head.head) else None)
    val specs = Seq(AggSpec("s", "v", AggFn.Sum),
      AggSpec("mn", "v", AggFn.Min), AggSpec("f", "v", AggFn.First))
    val rows = (0 until 120).map { i =>
      (java.time.LocalDateTime.of(2024, 2, 1, 0, 0)
        .plusSeconds(i * 97L), i * 1.0, i.toLong)
    }
    val seedDf = rows.toDF("t", "v", "rid")
    def run(cuts: Seq[Int]): Seq[org.apache.spark.sql.Row] = {
      val st = new Store(spark, tmpDir("propagg"), idx)
      val stream = new AggStream(st, "t", "rid",
        Map("o" -> StreamKeyCfg(None, "15 minutes", aggs = specs)),
        NRows(1000))
      val bounds = (0 +: cuts :+ rows.length).distinct.sorted
      stream.agg(bounds.sliding(2).map { case Seq(a, b) =>
        rows.slice(a, b).toDF("t", "v", "rid")
      }.toSeq.iterator)
      stream.results("o").orderBy("bin").collect().toSeq
    }
    val expected = run(Nil)
    val cutsGen = Gen.choose(0, 4)
      .flatMap(Gen.listOfN(_, Gen.choose(1, 119)))
    (1 to 5).foreach { i =>
      val cuts = sample(cutsGen, 3000L + i)
      assert(run(cuts) == expected, s"cuts=$cuts")
    }
  }
}
