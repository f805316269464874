package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the corpus-construction operators added in round 4:
  * sequence packing, decontamination, repetition signals.
  */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("packChunks: offsets, chunk spans, and partitioning invariance") {
    // shard 0: ids 0,2,4 (tokens 4,7,6); shard 1: ids 1,3 (tokens 12,3)
    val docs = Seq(
      (0L, "a b c d"), (1L, ("x " * 12).trim), (2L, ("y " * 7).trim),
      (3L, "p q r"), (4L, ("z " * 6).trim)).toDF("doc_id", "text")
    val got = PackOps.packChunks(docs, "doc_id",
        size(split($"text", " ")), shards = 2, capacity = 10)
      .select("doc_id", "shard", "n_tokens", "start_off",
        "chunk_first", "chunk_last")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    val expected = Set(
      (0L, 0L, 4L, 0L, 0L, 0L),   // [0,4) -> chunk 0
      (2L, 0L, 7L, 4L, 0L, 1L),   // [4,11) -> spans chunks 0..1
      (4L, 0L, 6L, 11L, 1L, 1L),  // [11,17) -> chunk 1
      (1L, 1L, 12L, 0L, 0L, 1L),  // [0,12) -> spans 0..1
      (3L, 1L, 3L, 12L, 1L, 1L))  // [12,15) -> chunk 1
    assert(got == expected)
    // deterministic under any input partitioning
    val re = PackOps.packChunks(docs.repartition(7), "doc_id",
        size(split($"text", " ")), shards = 2, capacity = 10)
      .select("doc_id", "shard", "n_tokens", "start_off",
        "chunk_first", "chunk_last")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(re == expected)
  }

  test("contamination overlap counts shared distinct n-grams") {
    val train = Seq(
      (10L, "one two three four five unique tail"),
      (11L, "nothing in common with anything here"),
      (12L, "one two three one two three repeated start")
    ).toDF("doc_id", "text")
    val eval = Seq(
      (90L, "eval doc holds one two three inside it"),
      (91L, "another eval doc")).toDF("doc_id", "text")
    val got = ContaminationOps.overlap(train, eval, "doc_id", "text", 3)
      .as[(Long, Long)].collect().toMap
    // "one two three" is the only shared 3-gram; doc 12 contains it
    // (distinct-counted once), doc 11 shares nothing -> absent
    assert(got == Map(10L -> 1L, 12L -> 1L))
  }

  test("packChunks clamps zero-token docs to an empty-at-chunk_first span") {
    val docs = Seq((0L, "a b c"), (2L, ""), (4L, "d e"))
      .toDF("doc_id", "text")
    // note split("", " ") gives [""] = 1 token; force a true zero via
    // a token expression that counts words only
    val tokens = when(length($"text") === 0, 0)
      .otherwise(size(split($"text", " ")))
    val got = PackOps.packChunks(docs, "doc_id", tokens, shards = 1,
        capacity = 4)
      .select("doc_id", "n_tokens", "start_off", "chunk_first", "chunk_last")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(0L) == ((3L, 0L, 0L, 0L)))
    // zero tokens at offset 3: chunk_last clamps to chunk_first (0),
    // never -1 / inverted
    assert(got(2L) == ((0L, 3L, 0L, 0L)))
    assert(got(4L) == ((2L, 3L, 0L, 1L)))
  }

  test("hashSample at rate 1.0 keeps every row") {
    val df = (0L until 1000L).toDF("id")
    assert(SampleOps.hashSample(df, "id", 1.0).count() == 1000L)
    val strat = df.withColumn("g", lit("en"))
    assert(SampleOps.stratifiedSample(strat, $"g", "id",
      Map("en" -> 1.0), 0.5).count() == 1000L)
  }

  test("bloomOverlap equals overlap (false positives removed by the join)") {
    val train = (0L until 60L).map(i =>
      (i, s"train doc $i carries words w${i % 7} w${i % 11} w${i % 13} " +
        s"plus filler f$i g$i h$i")).toDF("doc_id", "text")
    val eval = Seq(
      (900L, "train doc 3 carries words w3 w3 w3"),
      (901L, "completely disjoint benchmark prompt text here")
    ).toDF("doc_id", "text")
    for (n <- Seq(3, 5)) {
      val exact = ContaminationOps.overlap(train, eval, "doc_id", "text", n)
        .as[(Long, Long)].collect().toMap
      // tight fpp AND a sloppy one: results must be identical either
      // way — the bloom only prefilters, the equi-join decides
      for (fpp <- Seq(0.001, 0.5)) {
        val bloom = ContaminationOps
          .bloomOverlap(train, eval, "doc_id", "text", n, fpp)
          .as[(Long, Long)].collect().toMap
        assert(bloom == exact, s"n=$n fpp=$fpp")
      }
    }
  }

  test("persisted contamination index equals the index-free overlap") {
    val train = (0L until 60L).map(i =>
      (i, s"train doc $i carries words w${i % 7} w${i % 11} w${i % 13} " +
        s"plus filler f$i g$i h$i")).toDF("doc_id", "text")
    val evalA = Seq(
      (900L, "train doc 3 carries words w3 w3 w3")).toDF("doc_id", "text")
    val evalB = Seq(
      (901L, "completely disjoint benchmark prompt text here"),
      (902L, "doc 7 carries words w0 too")).toDF("doc_id", "text")
    val dir = tmpDir("contamidx") + "/idx"
    val n = 3
    // incremental: two benchmark drops, two build calls
    ContaminationOps.buildIndex(spark, dir, evalA, "doc_id", "text", n,
      rowsPerFile = 50)
    ContaminationOps.buildIndex(spark, dir, evalB, "doc_id", "text", n,
      rowsPerFile = 50)
    val exact = ContaminationOps
      .overlap(train, evalA.unionByName(evalB), "doc_id", "text", n)
      .as[(Long, Long)].collect().toMap
    // both probe shapes: driver-planned zone-map read and full equi-join
    for (maxKeys <- Seq(65536, 1)) {
      val got = ContaminationOps
        .probeIndex(spark, dir, train, "doc_id", "text", n, maxKeys)
        .as[(Long, Long)].collect().toMap
      assert(got == exact, s"maxDriverKeys=$maxKeys")
    }
    // probing with the wrong n is a config error, not a wrong answer
    intercept[IllegalArgumentException](
      ContaminationOps.probeIndex(spark, dir, train, "doc_id", "text", 5))
    // a stale bloom generation tag (crashed build) disables the
    // prefilter instead of causing false negatives
    new graft.store.OrderedDataset(spark, dir)
      .updateKv(Map("graft.contam.bloomrows" -> "-1"))
    val noBloom = ContaminationOps
      .probeIndex(spark, dir, train, "doc_id", "text", n)
      .as[(Long, Long)].collect().toMap
    assert(noBloom == exact)
  }

  test("capPerGroup keeps at most n per stratum, partition-invariant") {
    val df = (0L until 100L)
      .map(i => (i, if (i % 3 == 0) "a" else "b")).toDF("id", "g")
    val got = SampleOps.capPerGroup(df, $"g", "id", 5)
    val byG = got.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(byG == Map("a" -> 5L, "b" -> 5L))
    // survivors are a pure function of (stratum, id) — any partitioning
    val re = SampleOps.capPerGroup(df.repartition(7), $"g", "id", 5)
      .select("id").as[Long].collect().toSet
    assert(re == got.select("id").as[Long].collect().toSet)
    // a group smaller than n survives whole
    val small = SampleOps.capPerGroup(
      Seq((1L, "x"), (2L, "x")).toDF("id", "g"), $"g", "id", 5)
    assert(small.count() == 2)
  }

  test("classifierScoreDF matches a reference md5-weight computation") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def wgt(w: String): Long =
      java.lang.Long.parseLong(md5hex(w).take(6), 16) % 2001 - 1000
    val docs = Seq((1L, "alpha beta alpha gamma")).toDF("doc_id", "text")
    val expectedSum = Seq("alpha", "beta", "gamma").map(wgt).sum
    val row = TextOps.classifierScoreDF(docs, "doc_id", "text")
      .select("doc_id", "n_feats", "w_sum", "score")
      .as[(Long, Long, Long, Double)].collect()(0)
    assert(row._2 == 3L)
    assert(row._3 == expectedSum)
    assert(math.abs(row._4 - expectedSum / 3000.0) < 1e-6)
  }

  test("repetitionDF: dup-word fraction and top-bigram mode") {
    val docs = Seq(
      (1L, "a a a b"),
      (2L, "u v w x")).toDF("doc_id", "text")
    val got = TextOps.repetitionDF(docs, "doc_id", "text")
      .select("id", "n_words", "dup_word_frac", "n_bigrams",
        "top_bigram", "top_cnt", "top_frac")
      .as[(Long, Long, Double, Long, String, Long, Double)]
      .collect().toSet
    // doc 1: words {a,a,a,b}: 2 distinct of 4 -> 0.5; bigrams
    // [a a, a a, a b]: top "a a" x2 of 3 -> 0.666667
    // doc 2: all distinct -> 0.0; all bigrams count 1, tie breaks on
    // the lexicographically smallest ("u v")
    assert(got == Set(
      (1L, 4L, 0.5, 3L, "a a", 2L, 0.666667),
      (2L, 4L, 0.0, 3L, "u v", 1L, 0.333333)))
  }

  test("shuffleCoords: bijective per-shard positions, partition-invariant") {
    val docs = (0L until 40L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val got = SampleOps.shuffleCoords(docs, "doc_id", 4)
      .select("doc_id", "shard", "pos")
      .as[(Long, Long, Long)].collect()
    assert(got.length == 40)
    // round-robin shards, and positions within a shard are exactly 0..n-1
    got.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.forall(r => r._1 % 4 == shard))
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq)
    }
    // a reproducible permutation: same coordinates under any partitioning
    val re = SampleOps.shuffleCoords(docs.repartition(7), "doc_id", 4)
      .select("doc_id", "shard", "pos")
      .as[(Long, Long, Long)].collect()
    assert(re.toSet == got.toSet)
    // and genuinely shuffled: within-shard id order != pos order
    val shard0 = got.filter(_._2 == 0L).sortBy(_._3).map(_._1).toSeq
    assert(shard0 != shard0.sorted)
  }

  test("topFracPerGroup keeps ceil(num*n/den) best rows per stratum") {
    // group a: 5 rows -> ceil(5/2) = 3 kept; group b: 2 rows -> 1 kept
    val df = Seq(
      ("a", 1L, 10L), ("a", 2L, 40L), ("a", 3L, 30L), ("a", 4L, 20L),
      ("a", 5L, 40L), ("b", 6L, 5L), ("b", 7L, 50L))
      .toDF("grp", "id", "score")
    val got = SampleOps.topFracPerGroup(df, $"grp",
        Seq($"score".desc, $"id"), 1, 2)
      .select("grp", "id").as[(String, Long)].collect().toSet
    // a: scores desc with id tiebreak -> ids 2(40),5(40),3(30); b: id 7
    assert(got == Set(("a", 2L), ("a", 5L), ("a", 3L), ("b", 7L)))
    // num = den keeps everything
    val all = SampleOps.topFracPerGroup(df, $"grp",
      Seq($"score".desc, $"id"), 1, 1)
    assert(all.count() == 7)
  }

  test("tokenBudgetPerShard keeps the maximal best-first prefix") {
    // one shard (shards=1): order by score desc, tokens 5,5,5, budget 12
    // -> the two best fit (cum 5,10), the third would hit 15 > 12
    val df = Seq(
      (1L, 5L, 30L), (2L, 5L, 20L), (3L, 5L, 10L), (4L, 2L, 1L))
      .toDF("doc_id", "n_tokens", "score")
    val got = SampleOps.tokenBudgetPerShard(df, "doc_id", $"n_tokens",
        Seq($"score".desc), 1, 12L)
      .select("doc_id", "cum_tokens").as[(Long, Long)].collect().toSet
    // prefix is MAXIMAL but contiguous: doc 3 overflows at 15, and the
    // 2-token doc 4 after it must NOT sneak in (cum stays > 12)
    assert(got == Set((1L, 5L), (2L, 10L)))
    // zero budget keeps nothing; empty input is fine
    assert(SampleOps.tokenBudgetPerShard(df, "doc_id", $"n_tokens",
      Seq($"score".desc), 1, 0L).count() == 0)
  }

  test("overlapFraction: matched share per doc, uncontaminated docs at 0") {
    val train = Seq(
      (10L, "one two three four five tail"),   // grams incl. eval's
      (11L, "six seven eight nine ten"),       // no overlap
      (12L, "one two three")).toDF("doc_id", "text") // 3 words: 1 gram at n=3
    val eval = Seq((90L, "one two three four")).toDF("doc_id", "text")
    val got = ContaminationOps.overlapFraction(train, eval, "doc_id",
        "text", 3)
      .select("id", "n_grams", "n_shared", "contam_frac")
      .as[(Long, Long, Long, Double)].collect().toSet
    // doc 10: 4 distinct 3-grams, 2 match eval's {one two three,
    // two three four}; doc 11: 3 grams, 0 match; doc 12: 1 gram, 1 match
    assert(got == Set(
      (10L, 4L, 2L, 0.5), (11L, 3L, 0L, 0.0), (12L, 1L, 1L, 1.0)))
  }

  test("upsampleMix: copy accounting, determinism, downsampling") {
    val a = (0L until 200L).map((_, "x")).toDF("doc_id", "text")
    val b = (0L until 200L).map(i => (i + 1000L, "y")).toDF("doc_id", "text")
    val mixed = SampleOps.upsampleMix(
      Seq(("a", a, 2.25), ("b", b, 0.5)), "doc_id")
    val rows = mixed.select("source", "id", "copy")
      .as[(String, Long, Long)].collect().toSeq
    val byA = rows.filter(_._1 == "a").groupBy(_._2)
    // every source-a doc appears 2 or 3 times, copies numbered 0..n-1
    assert(byA.size == 200)
    assert(byA.values.forall { cs =>
      val n = cs.size
      (n == 2 || n == 3) && cs.map(_._3).sorted == (0L until n)
    })
    // the fractional fraction is in the right ballpark (md5-uniform)
    val extraA = byA.values.count(_.size == 3)
    assert(extraA > 20 && extraA < 80, s"frac(0.25) gave $extraA/200")
    // weight < 1 downsamples: single copies, roughly half survive
    val byB = rows.filter(_._1 == "b")
    assert(byB.forall(_._3 == 0L))
    assert(byB.size > 60 && byB.size < 140, s"rate 0.5 gave ${byB.size}")
    // pure function of (source, id): partitioning cannot change it
    val re = SampleOps.upsampleMix(
        Seq(("a", a.repartition(7), 2.25), ("b", b.repartition(3), 0.5)),
        "doc_id")
      .select("source", "id", "copy")
      .as[(String, Long, Long)].collect().toSeq
    assert(re.sorted == rows.sorted)
  }

  test("segmentDedup drops cross-doc segments, keeps order, null-safe") {
    val docs = Seq(
      (1L, "a b c d e f g h i j k l m n o p q r s t"), // segs A B
      (2L, "a b c d e f g h i j z z z z z z z z z z"), // shares seg A
      (3L, "only one short row")).toDF("doc_id", "text")
    val got = DedupOps.segmentDedup(docs, "doc_id", "text",
        segWords = 10, dfMin = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    // seg A ("a b ... j") appears in docs 1 and 2 -> dropped from both;
    // doc 1 keeps its second segment, doc 2 keeps the z-block, doc 3
    // (single short segment) is untouched
    assert(got.map(r => (r._1, r._2, r._3)) ==
      Seq((1L, 2L, 1L), (2L, 2L, 1L), (3L, 1L, 0L)))
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(0)._4 == md5hex("k l m n o p q r s t"))
    assert(got(1)._4 == md5hex("z z z z z z z z z z"))
    assert(got(2)._4 == md5hex("only one short row"))
  }

  test("segmentDedup keeps null-text documents with zero segments") {
    val docs = Seq((1L, "a b c"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    // doc 2 yields no segment rows; it must still come back (n_segs 0,
    // null digest — the trigramLmDF/repetitionDF contract), not vanish
    val got = DedupOps.segmentDedup(docs, "doc_id", "text",
        segWords = 10, dfMin = 2)
      .orderBy("doc_id").collect()
    assert(got.length == 2)
    assert(got(1).getLong(0) == 2L)
    assert(got(1).getLong(1) == 0L && got(1).getLong(2) == 0L)
    assert(got(1).isNullAt(3))
  }

  test("repetitionDF keeps documents with no bigrams (single word)") {
    val docs = Seq((1L, "solo"), (2L, "a b")).toDF("doc_id", "text")
    // the 1-word doc must still appear, with zero bigram counts — an
    // inner join would silently delete it (and any downstream
    // keep-filter would drop it from the corpus)
    val all = TextOps.repetitionDF(docs, "doc_id", "text").collect()
    assert(all.length == 2)
    val solo = all.find(_.getLong(0) == 1L).get
    assert(solo.getLong(1) == 1L)       // n_words
    assert(solo.getLong(3) == 0L)       // n_bigrams
    assert(solo.isNullAt(4))            // top_bigram
    assert(solo.getLong(5) == 0L)       // top_cnt
    assert(solo.isNullAt(6))            // top_frac
  }

  test("trigramLmDF training knobs bound the model, defaults are exact") {
    val docs = (0L until 60L).map { i =>
      (i, if (i % 10 == 9) "zq#8!x" * 4 else "the cat sat on the mat " * 3)
    }.toDF("doc_id", "text")
    val full = TextOps.trigramLmDF(docs, "doc_id", "text")
      .select("doc_id", "avg_nll").as[(Long, Double)].collect().toMap
    // sampled training still separates the garbled docs from the norm:
    // normal docs keep a low avg_nll, junk docs stay well above them
    val sampled = TextOps
      .trigramLmDF(docs, "doc_id", "text", trainSampleRate = 0.5)
      .select("doc_id", "avg_nll").as[(Long, Double)].collect().toMap
    val normAvg = (0L until 60L).filter(_ % 10 != 9)
      .map(sampled).sum / 54.0
    (0L until 60L).filter(_ % 10 == 9)
      .foreach(i => assert(sampled(i) > normAvg,
        s"junk doc $i not separated under sampled training"))
    // the sampled model stays close to the full model on the docs the
    // sample covers well (the repeated normal text)
    (0L until 60L).filter(_ % 10 != 9).foreach { i =>
      assert(math.abs(sampled(i) - full(i)) < 1.0,
        s"doc $i drifted: full=${full(i)} sampled=${sampled(i)}")
    }
    // minCount drops the junk-only trigrams from the model entirely:
    // junk docs then have NO in-model trigrams -> null avg_nll
    val cut = TextOps
      .trigramLmDF(docs, "doc_id", "text", minCount = 30L)
      .select("doc_id", "avg_nll").collect()
    assert(cut.filter(_.getLong(0) % 10 == 9).forall(_.isNullAt(1)))
    assert(cut.filter(_.getLong(0) % 10 != 9).forall(!_.isNullAt(1)))
    // the backstop fails fast, naming the knobs, instead of OOMing
    val boom = intercept[IllegalArgumentException] {
      TextOps.trigramLmDF(docs, "doc_id", "text", maxModelEntries = 5)
    }
    assert(boom.getMessage.contains("maxModelEntries"))
  }
}
