package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the corpus-size-adaptive sizing contracts: the LSH key-space
  * derivation (LshConfig.forCorpusSize) and the centroid k ∝ √n rule
  * (SimilarityOps.centroidFilterForCorpus). Driver-SF parity is the
  * load-bearing assertion — every oracle was generated against 24×6
  * planes and the id%25/id<5000 quantizer, so those resolutions are
  * part of the correctness gate, not a style choice.
  */
class LshConfigSpec extends SparkSpec {
  import spark.implicits._

  test("forCorpusSize resolves every driver-SF corpus to 24x6") {
    // 500 = sf0.001/sf0.01, 2000 = sf0.1, 20000 = the 10x replica
    for (n <- Seq(0L, 500L, 2000L, 20000L, 32000L))
      assert(LshConfig.forCorpusSize(n) == LshConfig(24, 6),
        s"n=$n must keep the historical oracle config")
  }

  test("forCorpusSize widens past the 6-bit ceiling (the 200k death)") {
    // the measured r5 failure point: 200k vectors, 6-bit bands
    assert(LshConfig.forCorpusSize(200000L) == LshConfig(36, 9))
    assert(LshConfig.forCorpusSize(2000000L) == LshConfig(48, 12))
    // clamp: never past MaxBits even for absurd corpora
    assert(LshConfig.forCorpusSize(Long.MaxValue / 4).planesPerBand ==
      LshConfig.MaxBits)
  }

  test("forCorpusSize bits are monotone in corpus size") {
    val sizes = Seq(1L, 1000L, 10000L, 100000L, 1000000L, 100000000L)
    val bits = sizes.map(LshConfig.forCorpusSize(_).planesPerBand)
    assert(bits == bits.sorted, s"non-monotone: ${sizes.zip(bits)}")
  }

  test("expectedCandidatePairs matches the collision-floor formula") {
    val cfg = LshConfig(24, 6)
    // 4 bands, 64 buckets: n=200k -> 4 * 200k^2 / 128 = 1.25e9
    assert(math.abs(cfg.expectedCandidatePairs(200000L) - 1.25e9) < 1.0)
  }

  test("lshNearDupPairs fails fast on a saturated band space") {
    val v = SimilarityOps.withNorm(
      Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
        .toDF("vec_id", "embedding"), "vec_id", "embedding")
    val planes = Seq(Seq(1.0, -1.0), Seq(-1.0, 1.0))
    val e = intercept[IllegalArgumentException] {
      // claimed corpus of 10M vectors against 1-bit bands: expected
      // occupancy 5e6 rows/bucket dwarfs the 2000-row cap
      SimilarityOps.lshNearDupPairs(v, planes, 1, 0.5,
        corpusCount = Some(10000000L))
    }
    assert(e.getMessage.contains("LshConfig.forCorpusSize"))
    // the r5 death reproduced as arithmetic: 200k vectors on 6-bit
    // bands (3125 rows/bucket) trips the same gate...
    val planes24 = SimilarityOps.hyperplanes(24, 2)
    intercept[IllegalArgumentException] {
      SimilarityOps.lshNearDupPairs(v, planes24, 6, 0.5,
        corpusCount = Some(200000L))
    }
    // ...while the SIZED config passes it at any corpus size (the gate
    // and the sizing share TargetBucketRows, so they can never fight)
    for (n <- Seq(200000L, 10000000L, 1000000000L)) {
      val cfg = LshConfig.forCorpusSize(n)
      assert(n.toDouble / cfg.bucketsPerBand <=
        4.0 * LshConfig.TargetBucketRows, s"sized config gated at n=$n")
    }
  }

  test("centroidFilterForCorpus equals the historical predicate at " +
      "driver SFs and grows ~sqrt(n) past 40k") {
    def ids(n: Long, filter: org.apache.spark.sql.Column): Set[Long] = {
      val df = spark.range(0, 250000L).select(col("id"))
      df.filter(filter).as[Long].collect().toSet
    }
    val historical = col("id") % 25 === 0 && col("id") < 5000L
    for (n <- Seq(500L, 2000L, 20000L, 40000L)) {
      assert(ids(n, SimilarityOps.centroidFilterForCorpus(n)) ==
        ids(n, historical), s"driver-SF centroid set changed at n=$n")
    }
    // 200k corpus: k = ceil(sqrt(200000)) = 448 -> cap 11200
    val big = ids(200000L, SimilarityOps.centroidFilterForCorpus(200000L))
    assert(big.size == 448 && big.max < 11200L && big.max >= 5000L)
  }

  test("lshNearDupPairs across band widths: exact precision always, " +
      "exact-duplicate recall at any width") {
    // 30 base directions + 5 exact-duplicate pairs; the widened-key
    // contract is (a) every returned pair passes the exact cosine
    // verify (precision 1 at ANY width — verification is exact), and
    // (b) identical vectors collide in every band at every width, so
    // exact-dup recall is 1 at ANY width. Near-threshold recall may
    // differ across widths by design (documented trade-off).
    val rnd = new scala.util.Random(7)
    def unit(dim: Int): Array[Float] = {
      val a = Array.fill(dim)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(a.map(x => x * x.toDouble).sum).toFloat
      a.map(_ / n)
    }
    val base = (0 until 30).map(i => (i.toLong, unit(16)))
    val dups = (0 until 5).map(i => (100L + i, base(i)._2.clone()))
    val v = SimilarityOps.withNorm((base ++ dups)
      .toDF("vec_id", "embedding"), "vec_id", "embedding").persist()
    val thr = 0.8
    // exact pair set by brute force (the precision oracle)
    val ids = (base ++ dups)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x * x.toDouble).sum)
      d / (na * nb)
    }
    val exact = (for {
      (i, va) <- ids; (j, vb) <- ids if i < j && cos(va, vb) >= thr
    } yield (i, j)).toSet
    val exactDups = (0 until 5).map(i => (i.toLong, 100L + i)).toSet
    assert(exactDups.subsetOf(exact))
    for (bits <- Seq(2, 6, 9); bands <- Seq(2, 4)) {
      val planes = SimilarityOps.hyperplanes(bands * bits, 16)
      val got = SimilarityOps.lshNearDupPairs(v, planes, bits, thr)
        .select("i", "j").as[(Long, Long)].collect().toSet
      assert(got.subsetOf(exact),
        s"false positive at $bands x $bits: ${got.diff(exact)}")
      assert(exactDups.subsetOf(got),
        s"exact dup missed at $bands x $bits: ${exactDups.diff(got)}")
    }
    v.unpersist(): Unit
  }

  test("lshNearDupPairsGrouped == lshNearDupPairs (pairs, cosines, " +
      "bucket-cap semantics)") {
    val rnd = new scala.util.Random(11)
    // 60 clustered vectors (guaranteed near-dups) + 40 random
    val vecs = ((0 until 60).map { i =>
      val base = Array.tabulate(16)(d => math.sin(d + i / 20).toFloat)
      (i.toLong, base.map(x => x + rnd.nextFloat() * 0.05f))
    } ++ (100 until 140).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat))))
      .toDF("vec_id", "embedding")
    val v = SimilarityOps.withNorm(vecs, "vec_id", "embedding").persist()
    val planes = SimilarityOps.hyperplanes(12, 16)
    def collect(dfp: org.apache.spark.sql.DataFrame) =
      dfp.select("i", "j", "cos").as[(Long, Long, Double)]
        .collect().toSet
    for (cap <- Seq(100000, 25)) {
      val a = collect(SimilarityOps.lshNearDupPairs(
        v, planes, 3, 0.6, maxBucketSize = cap))
      val b = collect(SimilarityOps.lshNearDupPairsGrouped(
        v, planes, 3, 0.6, maxBucketSize = cap))
      assert(a == b, s"cap=$cap: join=${a.size} grouped=${b.size}, " +
        s"diff=${(a.diff(b) ++ b.diff(a)).take(5)}")
      assert(a.nonEmpty || cap < 100000)
    }
    v.unpersist(): Unit
  }

  test("semanticClusterStats flags exactly the over-cap clusters") {
    val vecs = ((0 until 40).map(i => (i.toLong, Array(1.0f, 0.01f * i))) ++
      Seq((100L, Array(-1.0f, 0.0f)), (101L, Array(-1.0f, 0.01f))))
      .toDF("vec_id", "embedding")
    val v = SimilarityOps.withNorm(vecs, "vec_id", "embedding")
    // centroids 0 and 100: the 40-member cluster trips a cap of 10,
    // the 2-member cluster does not
    val stats = SimilarityOps.semanticClusterStats(
      v, col("id") === 0L || col("id") === 100L, maxClusterSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .toSet
    assert(stats == Set((0L, 40L, true), (100L, 2L, false)))
  }
}
