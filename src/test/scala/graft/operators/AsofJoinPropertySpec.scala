package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test of the as-of join against a brute-force model: for
  * random key/ts distributions (dense ties included) the union+window
  * implementation must equal "scan all right rows per left row, pick
  * the nearest at-or-before (resp. at-or-after), larger ts wins
  * backward / smaller wins forward". Right sides are generated UNIQUE
  * on (key, ts) — the operator's documented determinism precondition.
  */
class AsofJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  // small key/ts domains force collisions: ties on ts within a key,
  // left rows before/after every mark, empty keys
  private val leftGen: Gen[Seq[(Long, Long, Long)]] = for {
    n <- Gen.choose(1, 60)
    rows <- Gen.listOfN(n, for {
      k <- Gen.choose(0L, 4L)
      ts <- Gen.choose(0L, 20L)
    } yield (k, ts))
  } yield rows.zipWithIndex.map { case ((k, ts), i) => (i.toLong, ts, k) }

  // mark values are NULLABLE on purpose: a per-column ignoreNulls pick
  // would backfill a null attach value from an older right row — the
  // struct-atomic implementation must return the matched row's null
  private val rightGen: Gen[Seq[(Long, Long, Option[Double])]] = for {
    n <- Gen.choose(0, 30)
    rows <- Gen.listOfN(n, for {
      k <- Gen.choose(0L, 4L)
      ts <- Gen.choose(0L, 20L)
      nul <- Gen.prob(0.3)
    } yield (k, ts, nul))
  } yield rows.map(r => (r._1, r._2)).distinct.map { case (k, ts) =>
    val nul = rows.exists(r => r._1 == k && r._2 == ts && r._3)
    (ts, k, if (nul) None else Some(k * 100.0 + ts))
  }

  private def model(left: Seq[(Long, Long, Long)],
      right: Seq[(Long, Long, Option[Double])], forward: Boolean)
      : Map[Long, Option[Double]] =
    left.map { case (id, ts, k) =>
      val cands = right.filter { case (rts, rk, _) =>
        rk == k && (if (forward) rts >= ts else rts <= ts) }
      val best =
        if (cands.isEmpty) None
        else if (forward) cands.minBy(_._1)._3
        else cands.maxBy(_._1)._3
      id -> best
    }.toMap

  test("asof equals the brute-force model on random tie-dense data") {
    (1L to 8L).foreach { seed =>
      val l = sample(leftGen, seed)
      val r = sample(rightGen, seed + 100)
      val lDf = l.toDF("id", "ts", "key")
      val rDf = r.toDF("ts", "key", "mark")
      Seq(false, true).foreach { fwd =>
        val got = (if (fwd) AsofJoin.forward(lDf, rDf, Seq("key"), "ts",
            Seq("mark"))
          else AsofJoin.backward(lDf, rDf, Seq("key"), "ts", Seq("mark")))
          .select("id", "mark").as[(Long, Option[Double])]
          .collect().toMap
        assert(got == model(l, r, fwd),
          s"seed=$seed forward=$fwd: mismatch")
      }
    }
  }
}
