package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests of the curation/layout contracts against driver-side
  * models: whatever ids, scores, token counts, and partitionings the
  * generators produce, the operators must agree with a plain Scala
  * reference computation. Generators are driven directly (fixed seeds,
  * deterministic) — no scalatest-scalacheck bridge needed.
  */
class CurationPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  /** Rows: distinct ids, arbitrary integer scores, small token counts,
    * a stratum label from a tiny alphabet. */
  val rowsGen: Gen[Seq[(Long, Long, Long, String)]] = for {
    n <- Gen.choose(0, 120)
    ids <- Gen.pick(n, 0L until 500L)
    scores <- Gen.listOfN(n, Gen.choose(-50L, 50L))
    toks <- Gen.listOfN(n, Gen.choose(0L, 30L))
    langs <- Gen.listOfN(n, Gen.oneOf("en", "de", "zh"))
  } yield ids.toSeq.zip(scores).zip(toks).zip(langs)
    .map { case (((i, s), t), l) => (i, s, t, l) }

  test("shuffleCoords is a partitioning-independent bijection per shard") {
    (1 to 8).foreach { i =>
      val rows = sample(rowsGen, 40L + i)
      val shards = 1 + (i % 5)
      val df = rows.toDF("id", "score", "toks", "lang")
      val got = SampleOps.shuffleCoords(df.repartition(1 + i), "id", shards)
        .select("id", "shard", "pos").as[(Long, Long, Long)]
        .collect().toSet
      // model: shard = id mod shards; pos = rank of md5(id) in shard
      val md = java.security.MessageDigest.getInstance("MD5")
      def hex(id: Long) = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val expect = rows.map(_._1).groupBy(_ % shards).flatMap {
        case (sh, ids) =>
          ids.sortBy(id => (hex(id), id)).zipWithIndex
            .map { case (id, p) => (id, sh, p.toLong) }
      }.toSet
      assert(got == expect, s"seed ${40 + i}")
    }
  }

  test("topFracPerGroup matches the ceil model at any num/den") {
    (1 to 8).foreach { i =>
      val rows = sample(rowsGen, 70L + i)
      val (num, den) = Seq((1, 2), (1, 3), (2, 3), (1, 1), (0, 1))(i % 5)
      val df = rows.toDF("id", "score", "toks", "lang")
      val got = SampleOps.topFracPerGroup(df.repartition(3), $"lang",
          Seq($"score".desc, $"id"), num, den)
        .select("id").as[Long].collect().toSet
      val expect = rows.groupBy(_._4).flatMap { case (_, g) =>
        val sorted = g.sortBy(r => (-r._2, r._1))
        // ceil(num*n/den) via integer arithmetic, the op's contract
        sorted.take(((num.toLong * g.size + den - 1) / den).toInt)
      }.map(_._1).toSet
      assert(got == expect, s"seed ${70 + i} frac $num/$den")
    }
  }

  test("tokenBudgetPerShard is the maximal affordable prefix per shard") {
    (1 to 8).foreach { i =>
      val rows = sample(rowsGen, 90L + i)
      val shards = 1 + (i % 4)
      val budget = (i * 17L) % 120L
      val df = rows.toDF("id", "score", "toks", "lang")
      val got = SampleOps.tokenBudgetPerShard(df.repartition(2 + i),
          "id", $"toks", Seq($"score".desc), shards, budget)
        .select("id", "cum_tokens").as[(Long, Long)].collect().toMap
      val expect = rows.groupBy(_._1 % shards).flatMap { case (_, g) =>
        val sorted = g.sortBy(r => (-r._2, r._1))
        val cums = sorted.scanLeft(0L)(_ + _._3).tail
        sorted.zip(cums).takeWhile(_._2 <= budget)
          .map { case (r, c) => (r._1, c) }
      }
      assert(got == expect, s"seed ${90 + i} budget $budget")
    }
  }

  /** Random vectors, random caps: the chunked semantic-dedup candidate
    * set must (a) be a subset of the uncapped pairs, (b) contain EVERY
    * uncapped pair whose members sit within `cap` centroid-cosine
    * ranks of each other (the stated recall contract), and (c) equal
    * the uncapped set whenever cap >= the largest cluster. */
  test("semanticDupPairs chunking: subset, rank-window recall, cap-equality") {
    val vecGen: Gen[Seq[(Long, Array[Float])]] = for {
      n <- Gen.choose(12, 60)
      seeds <- Gen.listOfN(n, Gen.choose(0, 999))
    } yield seeds.zipWithIndex.map { case (s, i) =>
      (i.toLong, Array.tabulate(4)(j =>
        (math.sin(s * 0.7 + j) + 2.0).toFloat)) // positive-ish: cos spread
    }
    (1 to 5).foreach { i =>
      val rows = sample(vecGen, 700L + i)
      val df = rows.toDF("vec_id", "embedding")
      val v = SimilarityOps.withNorm(df, "vec_id", "embedding").persist()
      val centPred = col("id") % 10 === 0
      val thr = 0.9
      def pairs(cap: Int, dual: Boolean = false) =
        SimilarityOps.semanticDupPairs(v, centPred, thr, cap,
          dualChunkProjections = dual)
          .select("i", "j").as[(Long, Long)].collect().toSet
      val uncapped = pairs(rows.size) // cap >= any cluster: exact
      val cap = 1 + (i % 4)
      // the EXACT rank-window rule is a single-ranking property; the
      // dual default only ADDS second-ranking rescues, asserted below
      val capped = pairs(cap)
      assert(capped.subsetOf(uncapped), s"seed ${700 + i}: not a subset")
      val cappedDual = pairs(cap, dual = true)
      assert(capped.subsetOf(cappedDual) && cappedDual.subsetOf(uncapped),
        s"seed ${700 + i}: dual must sit between single and uncapped")
      assert(pairs(rows.size, dual = true) == uncapped,
        s"seed ${700 + i}: dual must equal uncapped when nothing chunks")
      // model the rank windows from the same assignment the op uses
      val assigned = SimilarityOps
        .ivfAssignTo(v, v.filter(centPred), keepScore = true)
        .select("id", "cid", "ccos").as[(Long, Long, Double)]
        .collect()
      val rank = assigned.groupBy(_._2).toSeq.flatMap { case (_, members) =>
        members.toSeq.sortBy(m => (-m._3, m._1)).zipWithIndex
          .map { case (m, r) => m._1 -> (r / cap) }
      }.toMap
      val expected = uncapped.filter { case (a, b) =>
        math.abs(rank(a) - rank(b)) <= 1 }
      assert(capped == expected,
        s"seed ${700 + i} cap $cap: chunk rule mismatch")
      v.unpersist(): Unit
    }
  }
}
