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
      // the fast path's IN-TASK skip must keep the window filter's
      // exact cap semantics (corpusCount arms the occupancy gate and
      // the tiny count takes the no-window shape)
      val c = collect(SimilarityOps.lshNearDupPairsGrouped(
        v, planes, 3, 0.6, maxBucketSize = cap,
        corpusCount = Some(4L)))
      assert(a == c, s"cap=$cap fast path: join=${a.size} fast=${c.size}")
      assert(a.nonEmpty || cap < 100000)
    }
    v.unpersist(): Unit
  }

  test("grouped chunking bounds a template bucket: linear pair count, " +
      "cluster connectivity preserved, unchunked parity when cap slack") {
    // the round-6 straggler shape: one hot bucket of identical
    // (template-duplicated) vectors — every pair is a true dup, so an
    // unchunked loop owes C(s,2) pairs in ONE task. Chunked at 100,
    // the bucket becomes many ≤200-row groups and the output is the
    // exact chunk-contract count: within-chunk 8·C(100,2) plus
    // adjacent-chunk 7·100² = 109600 pairs (not 319600), and those
    // adjacent-rank pairs still CHAIN all 800 copies into one
    // connected component — dedup semantics survive the truncation.
    val template = Array.tabulate(8)(d => (0.3 + 0.1 * d).toFloat)
    val v = SimilarityOps.withNorm(
      (0 until 800).map(i => (i.toLong, template.clone())).toDF(
        "vec_id", "embedding"), "vec_id", "embedding").persist()
    val planes = SimilarityOps.hyperplanes(3, 8)
    val chunked = SimilarityOps.lshNearDupPairsGrouped(
      v, planes, 3, 0.9, chunkSize = 100)
    assert(chunked.count() == 8L * 4950 + 7L * 100 * 100)
    // connectivity: union-find over the chunked pairs → one component
    val parent = Array.tabulate(800)(identity)
    def find(x: Int): Int = {
      var r = x; while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    chunked.select("i", "j").as[(Long, Long)].collect().foreach {
      case (i, j) => parent(find(i.toInt)) = find(j.toInt)
    }
    assert((0 until 800).map(find).distinct.size == 1,
      "chunked pairs must still connect the whole template cluster")
    // chunk cap ≥ bucket size → bit-identical to the unchunked loop
    val full = SimilarityOps.lshNearDupPairsGrouped(
      v, planes, 3, 0.9, chunkSize = 1000)
    assert(full.count() == 799L * 800 / 2)
    // the occupancy-gated FAST PATH (no rank window, in-task chunking)
    // must emit the bit-identical pair set on the same hot bucket:
    // corpusCount = 8 passes the gate (occupancy 1 × headroom ≤ 100)
    // while the 800-row template bucket still forces in-task chunking.
    // autoShapeProbe = false FORCES the fast shape — the auto probe
    // would (correctly) flip this 8-chunk hot bucket to the window
    // shape, which is asserted separately below
    val fastDf = SimilarityOps.lshNearDupPairsGrouped(
      v, planes, 3, 0.9, chunkSize = 100, corpusCount = Some(8L),
      autoShapeProbe = false)
    val fastSet = fastDf
      .select("i", "j", "cos").as[(Long, Long, Double)].collect().toSet
    val windowSet = chunked
      .select("i", "j", "cos").as[(Long, Long, Double)].collect().toSet
    assert(fastSet == windowSet,
      s"fast=${fastSet.size} window=${windowSet.size}, " +
        s"diff=${(fastSet.diff(windowSet) ++
          windowSet.diff(fastSet)).take(5)}")
    // the explicit skew knob selects the WINDOW shape (the rank
    // window is in the plan) while corpusCount — and so the
    // saturation gate — stays armed; output unchanged
    val viaKnob = SimilarityOps.lshNearDupPairsGrouped(
      v, planes, 3, 0.9, chunkSize = 100, corpusCount = Some(8L),
      assumeTemplateSkew = true)
    assert(viaKnob.queryExecution.optimizedPlan.toString
      .contains("row_number"), "skew knob must select the window shape")
    assert(!fastDf.queryExecution.optimizedPlan.toString
      .contains("row_number"), "fast path must carry no rank window")
    assert(viaKnob.select("i", "j", "cos").as[(Long, Long, Double)]
      .collect().toSet == windowSet)
    // the AUTO probe (the default) sees a template bucket past the
    // 4-chunk cutover and picks the window shape on its own, no knob
    // needed. The corpus needs enough NON-template rows that the
    // occupancy gate still says fast and the probe's exactness
    // shortcut does not skip (n ≥ cutover × chunk): 800 template
    // copies + 800 distinct vectors under one 8-bit band
    val pad = (1000 until 1800).map(i =>
      (i.toLong, Array.tabulate(8)(j => math.sin(i * 0.73 + j * 1.1))))
    val v2 = SimilarityOps.withNorm(
      ((0 until 800).map(i => (i.toLong,
        template.clone().map(_.toDouble))) ++ pad)
        .toDF("vec_id", "embedding"), "vec_id", "embedding").persist()
    val planes8 = SimilarityOps.hyperplanes(8, 8)
    def g2(skew: Boolean, probe: Boolean) =
      SimilarityOps.lshNearDupPairsGrouped(v2, planes8, 8, 0.9,
        chunkSize = 100, corpusCount = Some(1600L),
        assumeTemplateSkew = skew, autoShapeProbe = probe)
    val auto = g2(skew = false, probe = true)
    assert(auto.queryExecution.optimizedPlan.toString
      .contains("row_number"),
      "auto probe must flip a template-skewed corpus to the window " +
        "shape")
    // same pairs as the knob-forced window and the forced fast shape
    val autoSet = auto.select("i", "j", "cos")
      .as[(Long, Long, Double)].collect().toSet
    assert(autoSet == g2(skew = true, probe = false)
      .select("i", "j", "cos").as[(Long, Long, Double)].collect().toSet)
    assert(autoSet == g2(skew = false, probe = false)
      .select("i", "j", "cos").as[(Long, Long, Double)].collect().toSet)
    v2.unpersist(): Unit
    v.unpersist(): Unit
  }

  test("dual window path: the second ranking reuses the banded " +
      "exchange — ONE (band_id, bucket) shuffle, in-partition sorts " +
      "only") {
    // the window+dual shape's cost claim (PLANS.md r9) as a pinned
    // plan property: both row_number rankings and the count window
    // ride a single hashpartitioning(band_id, bucket) exchange;
    // adding the second projection must never add a shuffle
    val v = SimilarityOps.withNorm(
      (0 until 400).map(i => (i.toLong,
        Array.tabulate(8)(j => math.sin(i * 0.37 + j))))
        .toDF("vec_id", "embedding"), "vec_id", "embedding")
    val planes = SimilarityOps.hyperplanes(6, 8)
    val df = SimilarityOps.lshNearDupPairsGrouped(v, planes, 3, 0.9,
      chunkSize = 50, corpusCount = Some(400L),
      assumeTemplateSkew = true) // force the window shape, gate armed
    val plan = df.queryExecution.executedPlan.toString
    val bandedExchanges =
      raw"Exchange hashpartitioning\(band_id".r.findAllIn(plan).size
    assert(bandedExchanges == 1,
      s"expected ONE banded exchange, found $bandedExchanges:\n" +
        plan.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
    val rankWindows =
      raw"row_number\(\)".r.findAllIn(plan).size
    assert(rankWindows >= 2,
      s"expected both rankings in the plan, found $rankWindows")
  }

  test("auto shape probe keeps the fast path on a skew-free corpus " +
      "and estimates the hot bucket within sampling error") {
    // 4000 hash-noise vectors, 24×6 config: expected occupancy 62,
    // hottest bucket nowhere near 4 × chunk — auto stays fast
    val v = SimilarityOps.withNorm(
      (0 until 4000).map { i =>
        (i.toLong, Array.tabulate(8)(j =>
          math.sin(i * 12.9898 + j * 78.233) * 43758.5453 % 1.0))
      }.toDF("vec_id", "embedding"), "vec_id", "embedding").persist()
    val planes = SimilarityOps.hyperplanes(24, 8)
    // chunkSize 1000 puts the corpus (4000) past cutover × chunk, so
    // the probe RUNS (not the exactness skip) and still keeps fast
    val auto = SimilarityOps.lshNearDupPairsGrouped(
      v, planes, 6, 0.95, corpusCount = Some(4000L), chunkSize = 1000)
    assert(!auto.queryExecution.optimizedPlan.toString
      .contains("row_number"),
      "auto probe must keep the fast shape on a skew-free corpus")
    // and when the corpus CANNOT contain a cutover-sized bucket
    // (n < cutover × chunkSize), the probe is skipped exactly — same
    // fast shape, no Spark action in construction
    val skipped = SimilarityOps.lshNearDupPairsGrouped(
      v, planes, 6, 0.95, corpusCount = Some(4000L))
    assert(!skipped.queryExecution.optimizedPlan.toString
      .contains("row_number"))
    // the estimator: corpus ≤ ShapeProbeRows probes EXACTLY — equal
    // to the true hottest band-0 bucket from lshBucketStats (the
    // probe reads one band; a hot template bucket is hot in every)
    val est = SimilarityOps.estimatedTopBucket(v, planes, 6, 4000L)
    val truth = SimilarityOps.lshBucketStats(v, planes, 6)
      .filter(org.apache.spark.sql.functions.col("band_id") === 0)
      .agg(org.apache.spark.sql.functions.max("n")).head().getLong(0)
    assert(est == truth.toDouble, s"exact-rate probe drifted: $est " +
      s"vs $truth")
    // sub-sampled estimate (forced tiny sample) lands within a factor
    // of 2 of truth — plenty for a 4×-chunk cutover decision
    val est2 = SimilarityOps.estimatedTopBucket(v, planes, 6, 4000L,
      sampleRows = 1000L)
    assert(est2 > truth / 2.0 && est2 < truth * 2.0,
      s"sampled estimate off: $est2 vs $truth")
    v.unpersist(): Unit
  }

  test("saturation gate: grouped form runnable at the MaxBits ceiling " +
      "(the coded >20-bit growth path), join form strict everywhere") {
    val v = SimilarityOps.withNorm(
      Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
        .toDF("vec_id", "embedding"), "vec_id", "embedding")
    // forCorpusSize(5e9) clamps at MaxBits: occupancy 5e9/2^20 ≈ 4768
    // exceeds the 2000-row cap, but no wider space exists — the
    // CHUNKED grouped loop must accept the config it produced...
    val n = 5000000000L
    val cfg = LshConfig.forCorpusSize(n)
    assert(cfg.planesPerBand == LshConfig.MaxBits)
    val planes = SimilarityOps.hyperplanes(cfg.nPlanes, 2)
    SimilarityOps.lshNearDupPairsGrouped(v, planes, cfg.planesPerBand,
      0.5, corpusCount = Some(n)): Unit // plan constructs, no throw
    // ...while the unchunked join form still fails fast (quadratic
    // in-bucket work has no bound there)
    val e = intercept[IllegalArgumentException] {
      SimilarityOps.lshNearDupPairs(v, planes, cfg.planesPerBand,
        0.5, corpusCount = Some(n))
    }
    assert(e.getMessage.contains("lshNearDupPairsGrouped"))
    // expected occupancy is monotone THROUGH the clamp boundary
    // (n/500 = 2^20 at n ≈ 5.24e8): below it the sizing holds
    // occupancy ~flat, past it occupancy grows linearly — never drops
    val sizes = Seq(1e8, 5.24e8, 2.1e9, 5e9, 1e10).map(_.toLong)
    val occs = sizes.map { s =>
      val c = LshConfig.forCorpusSize(s)
      s.toDouble / c.bucketsPerBand
    }
    assert(occs == occs.sorted,
      s"occupancy not monotone through the clamp: ${sizes.zip(occs)}")
  }

  test("ragged plane sets arm the saturation gate without tripping " +
      "the LshConfig multiple-of invariant") {
    val v = SimilarityOps.withNorm(
      Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
        .toDF("vec_id", "embedding"), "vec_id", "embedding")
    // 7 planes / 3 per band: lshBands supports the ragged final band;
    // LshConfig(7, 3) would throw, so occupancy must be computed
    // directly from planesPerBand (ADVICE r6)
    val planes = SimilarityOps.hyperplanes(7, 2)
    SimilarityOps.lshNearDupPairsGrouped(v, planes, 3, 0.5,
      corpusCount = Some(100L)): Unit
    SimilarityOps.lshNearDupPairs(v, planes, 3, 0.5,
      corpusCount = Some(100L)): Unit
    // and a genuinely saturated ragged config still dies
    intercept[IllegalArgumentException] {
      SimilarityOps.lshNearDupPairs(v, planes, 3, 0.5,
        corpusCount = Some(10000000L))
    }: Unit
  }

  test("saturation gate binds at the NARROWEST band: a ragged leftover " +
      "band is not admitted by the chunked MaxBits exception") {
    val v = SimilarityOps.withNorm(
      Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
        .toDF("vec_id", "embedding"), "vec_id", "embedding")
    // 21 planes / 20 per band leaves a 1-BIT final band: two n/2-row
    // buckets that the full-width (20-bit) occupancy estimate never
    // sees (ADVICE r7 — the gate erred LAX here). The chunked form's
    // at-ceiling exception must NOT cover it: the remedy is fixing the
    // ragged band, and the error names it.
    val planes = SimilarityOps.hyperplanes(21, 2)
    val e = intercept[IllegalArgumentException] {
      SimilarityOps.lshNearDupPairsGrouped(v, planes, 20, 0.5,
        corpusCount = Some(5000000000L))
    }
    assert(e.getMessage.contains("ragged"), e.getMessage)
    assert(e.getMessage.contains("1-bit"), e.getMessage)
    // the same width WITHOUT the ragged band stays admitted at ceiling
    SimilarityOps.lshNearDupPairsGrouped(v,
      SimilarityOps.hyperplanes(20, 2), 20, 0.5,
      corpusCount = Some(5000000000L)): Unit
  }

  test("empty plane set rejected with a named error, not a head crash") {
    val v = SimilarityOps.withNorm(
      Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      SimilarityOps.lshNearDupPairsGrouped(v, Nil, 3, 0.5)
    }
    assert(e.getMessage.contains("at least one hyperplane"), e.getMessage)
  }

  test("bandsForRecall: the nBands growth formula") {
    // exact duplicates collide at any width — one band suffices
    assert(LshConfig.bandCollisionProb(1.0, 20) == 1.0)
    assert(LshConfig.bandsForRecall(1.0, 20) == 1)
    // spot value: p(0.9) = 1 - acos(0.9)/pi, R = 0.9 at 6-bit bands
    val p6 = math.pow(1.0 - math.acos(0.9) / math.Pi, 6)
    val expected6 =
      math.ceil(math.log(0.1) / math.log(1.0 - p6)).toInt
    assert(LshConfig.bandsForRecall(0.9, 6) == expected6)
    assert(expected6 >= 4 && expected6 <= 6) // sanity: ~5
    // wider bands need (many) more bands for the same recall floor —
    // the honest cost of holding recall at the MaxBits ceiling
    val l6 = LshConfig.bandsForRecall(0.9, 6)
    val l12 = LshConfig.bandsForRecall(0.9, 12)
    val l20 = LshConfig.bandsForRecall(0.9, 20)
    assert(l6 < l12 && l12 < l20 && l20 >= 40)
    // and a higher recall target is monotone too
    assert(LshConfig.bandsForRecall(0.9, 20, 0.99) >
      LshConfig.bandsForRecall(0.9, 20, 0.5))
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
