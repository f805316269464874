package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"),
    (2L, "completely different text with other words entirely"),
    (3L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
    (4L, "one two three four five six seven eight nine"))
    .toDF("doc_id", "text")

  test("exactDedup keeps the smallest id per digest") {
    val out = DedupOps.exactDedup(docs, "text", "doc_id")
    assert(out.count() == 4)
    assert(out.filter($"doc_id" === 3L).count() == 0)
    assert(out.filter($"doc_id" === 0L).count() == 1)
  }

  test("minhash LSH finds near and exact dups, not unrelated docs") {
    val sh = DedupOps.shingleArrays(docs, "doc_id", "text", 3)
    val sig = DedupOps.minhashSignature(sh, 12)
    val cand = DedupOps.lshCandidates(sig, 12, 4)
    val pairs = DedupOps.jaccardVerify(cand, sh, 0.5)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 3L))) // exact dup, jac = 1
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("fuzzyOverlap flags eval near-dups cross-frame: exact leaks " +
      "always caught, output is exactly the brute-force pair set, " +
      "unrelated docs never flagged") {
    // eval: a verbatim leak of doc 0, a lightly-edited leak of doc 1,
    // and an unrelated benchmark item
    val eval = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "the quick brown fox jumps over the lazy cat indeed"),
      (102L, "unrelated benchmark question about astrophysics topics"))
      .toDF("doc_id", "text")
    val out = ContaminationOps.fuzzyOverlap(docs, eval, "doc_id",
        "text", 3, 12, 4, 0.5)
      .as[(Long, Long, Double)].collect()
    val pairs = out.map(t => (t._1, t._2)).toSet
    // identical shingle sets give identical signatures in every band:
    // a verbatim leak is caught with certainty (docs 0 AND 3 are both
    // copies of eval 100)
    assert(pairs.contains((0L, 100L)) && pairs.contains((3L, 100L)))
    assert(!pairs.exists(_._2 == 102L), "unrelated eval item flagged")
    assert(!pairs.exists(p => p._1 == 2L || p._1 == 4L),
      "unrelated training doc flagged")
    // precision 1 with exact scores: every output pair is in the
    // brute-force cross-frame Jaccard>=0.5 set, with the same jac
    val tsh = DedupOps.shingleTable(docs, "doc_id", "text", 3)
      .as[(Long, String)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val esh = DedupOps.shingleTable(eval, "doc_id", "text", 3)
      .as[(Long, String)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    out.foreach { case (i, j, jac) =>
      val inter = tsh(i).intersect(esh(j)).size.toDouble
      val exp = inter / (tsh(i).size + esh(j).size - inter)
      assert(exp >= 0.5 && math.abs(jac - exp) < 1e-12,
        s"pair ($i,$j): jac=$jac expected $exp")
    }
  }

  test("fuzzy decontamination via the persisted eval screen equals " +
      "the index-free cross-frame screen") {
    val dir = tmpDir("fuzzy_eval_idx")
    val eval = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "the quick brown fox jumps over the lazy cat indeed"),
      (102L, "unrelated benchmark question about astrophysics topics"))
      .toDF("doc_id", "text")
    DedupIndex.buildMinhash(spark, dir, eval, "doc_id", "text",
      shingleN = 3, numHashes = 12, bands = 4, rowsPerFile = 500)
    val direct = ContaminationOps.fuzzyOverlap(docs, eval, "doc_id",
        "text", 3, 12, 4, 0.5)
      .as[(Long, Long, Double)].collect().toSet
    val viaIdx = DedupIndex.probeMinhash(spark, dir, docs, eval,
        "doc_id", "text", 3, 12, 4, 0.5)
      .select(col("j"), col("i"), col("jac"))
      .as[(Long, Long, Double)].collect().toSet
    assert(direct.nonEmpty && viaIdx == direct,
      s"index screen diverged: direct=$direct viaIdx=$viaIdx")
  }

  test("shingles/fingerprints survive documents shorter than the width") {
    val short = Seq((1L, "one two"), (2L, ""), (3L, "a b c d"))
      .toDF("doc_id", "text")
    // used to throw 'SQL array indices start at 1' (sequence(1,0) flips
    // to a descending [1,0]); now short docs just yield empty shingles
    val sh = DedupOps.shingleArrays(short, "doc_id", "text", 3)
      .as[(Long, Seq[String])].collect().toMap
    assert(sh(1L).isEmpty && sh(2L).isEmpty && sh(3L).size == 2)
    val fp = TextOps.fingerprintDF(short, "doc_id", "text")
    assert(fp.count() == 3)
    assert(fp.filter($"doc_id" === 2L).head.isNullAt(1)) // no 8-gram
  }

  test("cleaning scalars: url/email scrub + whitespace normalize") {
    val in = Seq(
      (1L, "see https://ex.com/a-b_c and http://y.z/d now"),
      (2L, "mail a.b+c@ex-1.org  or  d@e.f "),
      (3L, "plain text untouched"))
      .toDF("doc_id", "text")
    val out = in.select($"doc_id",
      TextOps.normalizeWs(TextOps.scrubEmails(
        TextOps.scrubUrls($"text"))).as("clean"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "see <URL> and <URL> now")
    assert(out(2L) == "mail <EMAIL> or <EMAIL>")
    assert(out(3L) == "plain text untouched")
  }

  test("store-backed IVF search reads only probed lists; matches ivfTopK") {
    val dir = tmpDir("ivfidx")
    val vecs = (0L until 200L).map { i =>
      (i, Array.tabulate(8)(j => math.sin(i * 0.37 + j).toFloat))
    }.toDF("vec_id", "embedding")
    val v = SimilarityOps.withNorm(vecs, "vec_id", "embedding").persist()
    val isCent = $"id" % 20 === 0
    IvfIndex.build(spark, s"$dir/idx", v, isCent, rowsPerFile = 20)
    val ds = new graft.store.OrderedDataset(spark, s"$dir/idx")
    assert(ds.meta.files.size >= 5) // several list files on disk
    val queries = v.filter($"id" < 5)
    val got = IvfIndex.search(spark, s"$dir/idx", queries,
      v.filter(isCent), nProbe = 2, k = 3)
    // pruned read: the search plan touches fewer files than the dataset
    val filesRead = got.select(input_file_name()).distinct().count()
    assert(filesRead < ds.meta.files.size,
      s"expected pruning: $filesRead vs ${ds.meta.files.size}")
    val expect = SimilarityOps.ivfTopK(queries, v, isCent, 2, 3)
      .orderBy("q_id", "rank").collect().toSeq
    assert(got.orderBy("q_id", "rank").collect().toSeq == expect)

    // incremental growth: add ONLY the new vectors, assigned against
    // the ORIGINAL centroid table — the ordered upsert merges them
    // into their lists, and search over the grown index equals a
    // from-scratch ivfTopK over the union (new ids avoid the centroid
    // filter so the centroid set is identical both ways)
    val extra = (200L until 240L).filter(_ % 20 != 0).map { i =>
      (i, Array.tabulate(8)(j => math.sin(i * 0.37 + j).toFloat))
    }.toDF("vec_id", "embedding")
    val vx = SimilarityOps.withNorm(extra, "vec_id", "embedding")
    IvfIndex.add(spark, s"$dir/idx", vx, v.filter(isCent),
      rowsPerFile = 20)
    val all = v.unionByName(vx).persist()
    val got2 = IvfIndex.search(spark, s"$dir/idx", queries,
      v.filter(isCent), nProbe = 2, k = 3)
    val expect2 = SimilarityOps.ivfTopK(queries, all, isCent, 2, 3)
      .orderBy("q_id", "rank").collect().toSeq
    assert(got2.orderBy("q_id", "rank").collect().toSeq == expect2)
    all.unpersist(); v.unpersist(): Unit
  }

  test("int8 quantization: unit norm, bounded roundtrip error") {
    val vecs = (0 until 20).map { i =>
      (i.toLong, Array.tabulate(16)(j => ((i * 13 + j * 7) % 9 - 4) * 0.5))
    }.toDF("id", "v")
    val vn = SimilarityOps.l2Normalize($"v")
    val sc = SimilarityOps.int8Scale(vn)
    val out = vecs.select(
      SimilarityOps.dot(vn, vn).as("n2"),
      sc.as("s"),
      zip_with(vn, SimilarityOps.int8Quantize(vn, sc),
        (x, q) => abs(x - q * sc)).as("err"))
      .collect()
    out.foreach { r =>
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-12) // unit norm
      val s = r.getDouble(1)
      assert(r.getSeq[Double](2).forall(_ <= s / 2 + 1e-12))
    }
  }

  test("hashSample is deterministic across partitionings, rate-accurate") {
    val ids = (0L until 4000L).toDF("id")
    val a = SampleOps.hashSample(ids.repartition(7), "id", 0.25)
      .as[Long].collect().toSet
    val b = SampleOps.hashSample(ids.coalesce(1), "id", 0.25)
      .as[Long].collect().toSet
    assert(a == b)
    assert(math.abs(a.size / 4000.0 - 0.25) < 0.05)
    // stratified: different strata get different rates
    val strat = ids.withColumn("s",
      when($"id" % 2 === 0, "keep_more").otherwise("other"))
    val out = SampleOps.stratifiedSample(strat, $"s", "id",
      Map("keep_more" -> 0.8), 0.1)
    val byStratum = out.groupBy("s").count()
      .as[(String, Long)].collect().toMap
    assert(math.abs(byStratum("keep_more") / 2000.0 - 0.8) < 0.1)
    assert(math.abs(byStratum("other") / 2000.0 - 0.1) < 0.1)
  }

  test("dupClusters: transitive pairs collapse to one min-id cluster") {
    // chain 1-2, 2-3 plus isolated pair 10-11: {1,2,3} and {10,11}
    val pairs = Seq((2L, 3L), (1L, 2L), (10L, 11L)).toDF("i", "j")
    val out = DedupOps.dupClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("dupClusters: long chains converge with a constant-size plan") {
    // a 14-node path needs several propagation rounds; the returned
    // frame's plan must stay checkpoint-rooted (constant node count),
    // not grow with the round count — the point of per-round lineage
    // truncation (VERDICT r2 #8)
    // driverMaxEdges = 0 pins the DISTRIBUTED loop (the default hybrid
    // would collapse 13 edges on the driver)
    val chain = (1L until 14L).map(i => (i, i + 1)).toDF("i", "j")
    val out = DedupOps.dupClusters(chain, driverMaxEdges = 0)
    val planNodes = out.queryExecution.analyzed.collect { case p => p }.size
    assert(planNodes <= 10, s"plan grew with rounds: $planNodes nodes")
    val labels = out.as[(Long, Long)].collect().toMap
    assert(labels == (1L to 14L).map(_ -> 1L).toMap)
    // an exhausted iteration budget returns (unconverged) with a
    // warning instead of looping or throwing
    val partial = DedupOps.dupClusters(chain, maxIter = 1,
      driverMaxEdges = 0)
      .as[(Long, Long)].collect().toMap
    assert(partial.size == 14)
  }

  test("dupClusters drops null-endpoint pairs on both paths") {
    val pairs = Seq(
      (java.lang.Long.valueOf(1L), java.lang.Long.valueOf(2L)),
      (null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(3L)),
      (java.lang.Long.valueOf(4L), null.asInstanceOf[java.lang.Long]))
      .toDF("i", "j")
    val hybrid = DedupOps.dupClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(hybrid == Map(1L -> 1L, 2L -> 1L))
    val dist = DedupOps.dupClusters(pairs, driverMaxEdges = 0)
      .as[(Long, Long)].collect().toMap
    assert(dist == Map(1L -> 1L, 2L -> 1L))
  }

  test("sessionize splits on gap and aggregates per session") {
    import graft.agg.Sessionize
    import java.time.LocalDateTime
    def t(s: String) = LocalDateTime.parse(s)
    val ev = Seq(
      (1L, t("2024-01-01T00:00:00"), 1.0, 0L),
      (1L, t("2024-01-01T00:10:00"), 2.0, 1L),
      (1L, t("2024-01-01T01:00:00"), 3.0, 2L), // 50-min gap -> new session
      (2L, t("2024-01-01T00:00:00"), 4.0, 3L))
      .toDF("user_id", "ts", "value", "event_id")
    val out = Sessionize.sessions(ev, Seq("user_id"), $"ts", $"event_id",
        "30 minutes", Seq(count(lit(1)).as("n")))
      .select("user_id", "session_idx", "n")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 0L, 2L), (1L, 1L, 1L), (2L, 0L, 1L)))
  }

  test("simhash is invariant to partitioning and finds the exact dup") {
    val s1 = DedupOps.simhash(docs.repartition(7), "doc_id", "text")
      .orderBy("id").as[(Long, Long)].collect().toSeq
    val s2 = DedupOps.simhash(docs.coalesce(1), "doc_id", "text")
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(s1 == s2)
    val m = s1.toMap
    assert(m(0L) == m(3L))
    val pairs = DedupOps.simhashPairs(
      DedupOps.simhash(docs, "doc_id", "text"), 3)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 3L)))
  }

  test("aHash: near-identical payloads pair through simhash banding") {
    // base payloads + clones differing by ONE substituted char (same
    // length, so sample positions align): perceptual Hamming distance
    // is tiny; an unrelated payload pairs with nothing
    val base = (0 until 4).map { k =>
      (10L + k, (0 until 200).map(i =>
        ('a' + ((i * 7 + k) % 26)).toChar).mkString)
    }
    val clones = base.map { case (id, t) =>
      (id + 100L, t.updated(13, 'z')) }
    val noise = Seq((999L, (0 until 200).map(i =>
      ('a' + ((i * 13 + 11) % 26)).toChar).mkString))
    val payloads = (base ++ clones ++ noise).toDF("doc_id", "text")
    val hashed = MultimodalOps.withAHash(payloads, "doc_id", "text")
    // partitioning invariance of the hash itself
    val h1 = hashed.orderBy("id").as[(Long, Long)].collect().toSeq
    val h2 = MultimodalOps.withAHash(payloads.repartition(5),
        "doc_id", "text")
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(h1 == h2)
    // every (base, clone) pair is within Hamming 3 of its partner
    val pairs = DedupOps.simhashPairs(
        hashed.withColumnRenamed("ahash", "simhash"), 3)
      .select("i", "j").as[(Long, Long)].collect().toSet
    base.foreach { case (id, _) =>
      assert(pairs.contains((id, id + 100L)),
        s"clone pair $id missing from $pairs")
    }
    assert(!pairs.exists { case (i, j) => i == 999L || j == 999L })
  }

  test("brute-force top-k ranks an identical vector first") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f)),   // identical to 0
      (2L, Array(0.9f, 0.1f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val v = SimilarityOps.withNorm(vecs, "vec_id", "embedding")
    val top = SimilarityOps.bruteForceTopK(v.filter($"id" === 0L), v, 3)
      .orderBy("rank").as[(Long, Int, Long, Double)].collect()
    assert(top.head._3 == 1L && top.head._4 == 1.0)
    assert(top(1)._3 == 2L)
    assert(top(2)._3 == 3L)
  }

  test("native dot_product expression matches the builtin composition") {
    val vecs = (0 until 50).map { i =>
      (i.toLong, Array.tabulate(64)(j => ((i * 31 + j * 7) % 13 - 6) * 0.25f))
    }.toDF("vec_id", "embedding")
    val v = SimilarityOps.asDouble($"embedding")
    val both = vecs.crossJoin(vecs.select($"embedding".as("e2")))
      .select(
        SimilarityOps.dot(v, SimilarityOps.asDouble($"e2")).as("native"),
        SimilarityOps.dotBuiltin(v, SimilarityOps.asDouble($"e2"))
          .as("builtin"))
      .collect()
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("dot_product matches builtin on length-mismatch and null elements") {
    val df = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)),
      (2L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0)),
      (3L, Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0)),
      (4L, Seq[java.lang.Double](), Seq[java.lang.Double]()))
      .toDF("id", "a", "b")
    val rows = df.select($"id",
        SimilarityOps.dot($"a", $"b").as("native"),
        SimilarityOps.dotBuiltin($"a", $"b").as("builtin"))
      .orderBy($"id").collect()
    rows.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"null mismatch at id=${r.get(0)}")
      if (!r.isNullAt(1)) assert(r.getDouble(1) == r.getDouble(2))
    }
    assert(rows(1).isNullAt(1)) // length mismatch -> NULL
    assert(rows(2).isNullAt(1)) // null element -> NULL
    assert(rows(3).getDouble(1) == 0.0)
  }

  test("langId picks a deterministic language with tie-break") {
    val out = docs.select(TextOps.langId($"text").as("lang"))
      .as[String].collect()
    assert(out.forall(Set("de", "en", "es", "fr", "zh", "und").contains))
    // 'the ... the ...' text has strong en-profile markers
    val en = docs.filter($"doc_id" === 0L)
      .select(TextOps.langId($"text")).as[String].head()
    assert(en == "en")
  }

  test("fingerprintDF equals the array-expression form") {
    val a = TextOps.fingerprintDF(docs, "doc_id", "text").orderBy("doc_id")
      .as[(Long, String, String)].collect().toSeq
    val b = docs.select($"doc_id" +: TextOps.fingerprintCols($"text"): _*)
      .orderBy("doc_id").as[(Long, String, String)].collect().toSeq
    assert(a == b)
  }

  test("multimodal resize: exact nearest-neighbor byte resample") {
    val df = Seq((1L, "abcd"), (2L, "ab"), (3L, ""))
      .toDF("id", "payload")
      .select($"id", $"payload".cast("binary").as("payload"))
    val got = MultimodalOps.resize(spark, df, "id", "payload", 4)
      .collect().map(r => r.id -> ((r.n_out, r.digest))).toMap
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(1L) == ((4L, md5("abcd")))) // identity at equal length
    // upsample 2 -> 4: indices 0,0,1,1 -> "aabb"
    assert(got(2L) == ((4L, md5("aabb"))))
    assert(got(3L) == ((0L, md5(""))))     // empty stays empty
    intercept[IllegalArgumentException] {
      MultimodalOps.resize(spark, df, "id", "payload", 0)
    }: Unit
  }

  test("multimodal ops treat null payloads as empty, not NPE") {
    val df = Seq((1L, Some("ab")), (2L, None))
      .toDF("id", "payload")
      .select($"id", $"payload".cast("binary").as("payload"))
    val rz = MultimodalOps.resize(spark, df, "id", "payload", 4)
      .collect().map(r => r.id -> r.n_out).toMap
    assert(rz == Map(1L -> 4L, 2L -> 0L))
    val fs = MultimodalOps.frameSample(spark, df, "id", "payload", 2)
      .collect().map(r => r.id -> r.n_frames).toMap
    assert(fs == Map(1L -> 1L, 2L -> 0L))
    val dc = MultimodalOps.decodeFeatures(spark, df, "id", "payload")
      .collect().map(r => r.id -> r.n_bytes).toMap
    assert(dc == Map(1L -> 2L, 2L -> 0L))
  }

  test("real image decode: PNG round trip, corrupt and null payloads") {
    val ids = Seq(0L, 7L, 123L, 4567L).toDF("doc_id")
    val imgs = MultimodalOps.synthImages(spark, ids, "doc_id")
    val got = MultimodalOps.decodeImages(spark, imgs, "doc_id", "payload")
      .collect().map(f => f.id -> f).toMap
    Seq(0L, 7L, 123L, 4567L).foreach { id =>
      val w = (8 + id % 5).toInt; val h = (8 + id % 3).toInt
      val a = id % 200; val b = id * 7 % 200
      val expSum = (a * (w / 2) + b * (w - w / 2)) * h
      val f = got(id)
      assert(f.ok && f.width == w && f.height == h,
        s"id $id: got $f")
      assert(f.luma_sum == expSum, s"id $id: ${f.luma_sum} != $expSum")
    }
    // the Decoder plug point runs the same real decode
    assert(MultimodalOps.realDecoder(MultimodalOps.synthPng(7L)) ==
      ((10L, 9L, got(7L).luma_sum)))
    // corrupt / non-image / null payloads degrade to ok=false rows
    val junk = Seq(
      (1L, Some("not a png at all".getBytes("UTF-8"))),
      (2L, Some(Array.emptyByteArray)),
      (3L, None: Option[Array[Byte]]),
      (4L, Some(MultimodalOps.synthPng(4L).take(10)))) // truncated header
      .toDF("doc_id", "payload")
    val bad = MultimodalOps.decodeImages(spark, junk, "doc_id", "payload")
      .collect()
    assert(bad.length == 4 && bad.forall(f =>
      !f.ok && f.width == -1 && f.height == -1 && f.luma_sum == -1L))
  }

  test("real audio decode: WAV round trip, corrupt and null payloads") {
    val ids = Seq(0L, 3L, 11L, 999L).toDF("doc_id")
    val clips = MultimodalOps.synthAudio(spark, ids, "doc_id")
    val got = MultimodalOps.decodeAudio(spark, clips, "doc_id", "payload")
      .collect().map(f => f.id -> f).toMap
    Seq(0L, 3L, 11L, 999L).foreach { id =>
      val n = (800 + id % 5 * 80).toInt
      val k = (id % 7 + 1).toInt
      val samples = (0 until n).map(i => (i.toLong * k % 200 - 100) * 50)
      val f = got(id)
      assert(f.ok && f.sample_rate == 8000 && f.channels == 1,
        s"id $id: $f")
      assert(f.n_samples == n.toLong)
      assert(f.amp_sum == samples.sum, s"id $id amp_sum")
      assert(f.peak == samples.map(math.abs).max, s"id $id peak")
    }
    val junk = Seq(
      (1L, Some("RIFFnope".getBytes("UTF-8"))),
      (2L, Some(Array.emptyByteArray)),
      (3L, None: Option[Array[Byte]]))
      .toDF("doc_id", "payload")
    val bad = MultimodalOps.decodeAudio(spark, junk, "doc_id", "payload")
      .collect()
    assert(bad.length == 3 && bad.forall(f => !f.ok && f.n_samples == -1L))
  }

  test("real frame sampling: animated GIF round trip, stride, junk") {
    val ids = Seq(0L, 1L, 2L, 3L, 42L).toDF("doc_id")
    val clips = MultimodalOps.synthGifs(spark, ids, "doc_id")
    def run(k: Int) =
      MultimodalOps.sampleFrames(spark, clips, "doc_id", "payload", k)
        .collect().map(f => f.id -> f).toMap
    val got = run(2)
    Seq(0L, 1L, 2L, 3L, 42L).foreach { id =>
      val nf = (2 + id % 4).toInt; val h = (4 + id % 3).toInt
      val sampled = 0 until nf filter (_ % 2 == 0)
      val luma = sampled.map(f => (id * 7 + f * 13) % 200 * 8 * h).sum
      val f = got(id)
      assert(f.ok && f.n_frames == nf && f.n_sampled == sampled.size,
        s"id $id: $f")
      assert(f.luma_sum == luma, s"id $id: ${f.luma_sum} != $luma")
    }
    // stride 1 decodes EVERY frame: n_sampled == n_frames
    assert(run(1).values.forall(f => f.ok && f.n_sampled == f.n_frames))
    // stride past the clip: only frame 0
    assert(run(100).values.forall(f => f.ok && f.n_sampled == 1L))
    // corrupt / empty / null payloads degrade to ok=false
    val junk = Seq(
      (1L, Some("GIF89a but not really".getBytes("UTF-8"))),
      (2L, Some(Array.emptyByteArray)),
      (3L, None: Option[Array[Byte]]))
      .toDF("doc_id", "payload")
    val bad = MultimodalOps.sampleFrames(spark, junk, "doc_id",
      "payload", 2).collect()
    assert(bad.length == 3 && bad.forall(f => !f.ok && f.n_frames == -1L))
    // a single-frame PNG is still a valid 1-frame container
    val png = MultimodalOps.synthImages(spark, Seq(7L).toDF("doc_id"),
      "doc_id")
    val one = MultimodalOps.sampleFrames(spark, png, "doc_id",
      "payload", 2).collect().head
    assert(one.ok && one.n_frames == 1L && one.n_sampled == 1L)
    // untruncated clips report truncated = false
    assert(got.values.forall(f => !f.truncated))
  }

  test("frame-cap truncation is SURFACED, not a silently short count") {
    // id 42 -> 4 frames. A 3-frame cap stops with a frame unread:
    // ok stays true (the prefix decoded fine) but truncated flags it.
    val clip = MultimodalOps.synthGifs(spark, Seq(42L).toDF("doc_id"),
      "doc_id")
    val capped = MultimodalOps.sampleFrames(spark, clip, "doc_id",
      "payload", 1, maxFrames = 3).collect().head
    assert(capped.ok && capped.n_frames == 3L && capped.truncated,
      s"$capped")
    // an EXACT-cap clip is complete, not truncated (the one-probe
    // disambiguation past the cap)
    val exact = MultimodalOps.sampleFrames(spark, clip, "doc_id",
      "payload", 1, maxFrames = 4).collect().head
    assert(exact.ok && exact.n_frames == 4L && !exact.truncated,
      s"$exact")
  }

  test("a corrupt frame header AT the cap reports truncated, not " +
      "ok=false (the cap guarantees the decoded prefix)") {
    // id 1 -> 3 frames. Strip the GIF trailer and append an unknown
    // block type where frame 3 would start: the cap probe's getWidth
    // throws a NON-IndexOutOfBounds reader error — exactly the
    // adversarial tail the cap exists to bound. The successfully
    // decoded 3-frame prefix must survive as truncated=true, not be
    // voided to ok=false by the probe's failure.
    val g3 = MultimodalOps.synthGifs(spark, Seq(1L).toDF("doc_id"),
      "doc_id").select("payload").as[Array[Byte]].head()
    assert(g3.last == 0x3B.toByte, "synth GIF must end with the trailer")
    val corrupt = g3.dropRight(1) ++ Array.fill(8)(0x99.toByte)
    val row = Seq((1L, corrupt)).toDF("doc_id", "payload")
    val f = MultimodalOps.sampleFrames(spark, row, "doc_id", "payload",
      1, maxFrames = 3).collect().head
    assert(f.ok && f.n_frames == 3L, s"prefix must survive: $f")
    assert(f.truncated, s"non-IOOBE probe failure must read truncated: $f")
  }

  test("multimodal fake decode features match byte arithmetic") {
    val bin = docs.select($"doc_id", $"text".cast("binary").as("payload"))
    val out = MultimodalOps.decodeFeatures(spark, bin, "doc_id", "payload")
      .orderBy("id").collect()
    val texts = docs.orderBy("doc_id").as[(Long, String)].collect()
    out.zip(texts).foreach { case (f, (_, t)) =>
      assert(f.n_bytes == t.length)
      assert(f.checksum == t.map(_.toLong).sum % 997)
      assert(f.head_byte == t.head.toLong)
    }
  }

  /** Deterministic synthetic 64-dim vectors (same recipe as the dot
    * product spec) for the PQ tests. */
  private def pqVecs(n: Int) = (0 until n).map { i =>
    (i.toLong, Array.tabulate(64)(j => ((i * 31 + j * 7) % 13 - 6) * 0.25f))
  }.toDF("vec_id", "embedding")

  test("pqEncode matches a driver-side argmin model; codes in range") {
    val v = SimilarityOps.withNorm(pqVecs(120), "vec_id", "embedding")
    val cb = SimilarityOps.pqCodebook(v, 8, 16, 5L)
    val enc = SimilarityOps.pqEncode(v, cb)
      .select($"id", $"codes", $"rnorm").orderBy("id")
      .as[(Long, Seq[Int], Double)].collect()
    val raw = v.select($"id", $"vec").orderBy("id")
      .as[(Long, Seq[Double])].collect().toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    enc.foreach { case (id, codes, rnorm) =>
      assert(codes.length == 8 && codes.forall(c => c >= 0 && c < 16))
      val vec = raw(id)
      val expect = (0 until 8).map { m =>
        val sub = vec.slice(m * 8, m * 8 + 8)
        (0 until 16).minBy { k =>
          val cb2 = r6(cb(m)(k).map(x => x * x).sum)
          val d = cb2 - 2 * r6(sub.zip(cb(m)(k)).map(p => p._1 * p._2).sum)
          (d, k)
        }
      }
      assert(codes == expect, s"id=$id")
      val rn = math.sqrt((0 until 8).map(m =>
        BigDecimal(r6(cb(m)(codes(m)).map(x => x * x).sum))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble)
      assert(math.abs(rnorm - rn) < 1e-12, s"id=$id rnorm")
    }
  }

  test("ivfPqTopK: deterministic, ranked by PQ score, self excluded") {
    val v = SimilarityOps.withNorm(pqVecs(120), "vec_id", "embedding")
      .persist()
    val cb = SimilarityOps.pqCodebook(v, 8, 16, 5L)
    val run1 = SimilarityOps.ivfPqTopK(v.filter($"id" < 5), v,
      $"id" % 25 === 0, cb, nProbe = 2, k = 3)
      .orderBy("q_id", "rank").collect()
    val run2 = SimilarityOps.ivfPqTopK(v.filter($"id" < 5), v,
      $"id" % 25 === 0, cb, nProbe = 2, k = 3)
      .orderBy("q_id", "rank").collect()
    assert(run1.toSeq == run2.toSeq)
    assert(run1.nonEmpty)
    run1.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.map(_.getInt(1)).toSeq == (1 to rows.length))
      assert(rows.forall(_.getLong(2) != q))
      // ranks ordered by descending pq score
      val scores = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    v.unpersist()
  }

  test("store-backed PQ index: codes-only layout, pruned reads, " +
      "matches ivfPqTopK") {
    val dir = tmpDir("pqidx")
    val v = SimilarityOps.withNorm(pqVecs(200), "vec_id", "embedding")
      .persist()
    val isCent = $"id" % 20 === 0
    val cb = SimilarityOps.pqCodebook(v, 8, 16, 5L)
    IvfIndex.buildPq(spark, s"$dir/idx", v, isCent, cb, rowsPerFile = 20)
    val ds = new graft.store.OrderedDataset(spark, s"$dir/idx")
    assert(ds.meta.files.size >= 5)
    // compressed layout: codes + rnorm only, no vector payload on disk
    assert(ds.df.columns.sorted.toSeq ==
      Seq("cid", "codes", "id", "rnorm"))
    val queries = v.filter($"id" < 5)
    val got = IvfIndex.searchPq(spark, s"$dir/idx", queries,
      v.filter(isCent), cb, nProbe = 2, k = 3)
    val filesRead = got.select(input_file_name()).distinct().count()
    assert(filesRead < ds.meta.files.size,
      s"expected pruning: $filesRead vs ${ds.meta.files.size}")
    val expect = SimilarityOps.ivfPqTopK(queries, v, isCent, cb, 2, 3)
      .orderBy("q_id", "rank").collect().toSeq
    assert(got.orderBy("q_id", "rank").collect().toSeq == expect)
    v.unpersist(): Unit
  }

  test("lshNearDupPairs: degenerate buckets skipped under maxBucketSize") {
    // a template cluster: 40 identical vectors land in ONE bucket of
    // every band; 3 distinct near-pairs elsewhere survive the cap
    val tpl = (0 until 40).map(i =>
      (100L + i, Array(1.0f, 0.0f, 0.0f, 0.0f)))
    val others = Seq(
      (1L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 0.999f, 0.01f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f, 0.0f)))
    val v = SimilarityOps.withNorm((tpl ++ others).toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    val planes = Seq(
      Seq(1.0, 1.0, -1.0, 0.0), Seq(1.0, -1.0, 0.0, 1.0),
      Seq(-1.0, 0.0, 1.0, 1.0), Seq(0.0, 1.0, 1.0, -1.0))
    def pairs(cap: Int) =
      SimilarityOps.lshNearDupPairs(v, planes, 2, 0.99, cap)
        .select("i", "j").as[(Long, Long)].collect().toSet
    val all = pairs(100000) // default-equivalent: nothing skipped
    assert(all.contains((1L, 2L)))
    assert(all.exists(p => p._1 >= 100L)) // template pairs found
    // cap below the template bucket: its s^2/2 pairs vanish, the
    // small-bucket pair survives
    val capped = pairs(10)
    assert(capped.contains((1L, 2L)))
    assert(!capped.exists(p => p._1 >= 100L && p._2 >= 100L),
      s"template pairs not skipped: $capped")
  }

  test("semanticDupPairs: chunk cap bounds a skewed cluster's pairs") {
    // ONE degenerate cluster: every vector near the same direction, so
    // the single centroid absorbs all 300 members. Consecutive ids are
    // near-duplicates (tiny angular step); distant ids are not.
    val n = 300
    val vecs = (0 until n).map { i =>
      val t = i * 0.002
      (i.toLong, Array(math.cos(t).toFloat, math.sin(t).toFloat, 0.1f))
    }.toDF("vec_id", "embedding")
    val v = SimilarityOps.withNorm(vecs, "vec_id", "embedding").persist()
    val uncapped =
      SimilarityOps.semanticDupPairs(v, $"id" === 0L, 0.999997)
        .as[(Long, Long, Double)].collect().toSet
    assert(uncapped.nonEmpty)
    // cap far under the cluster size: the pair BUDGET must collapse
    // from |c|^2/2 to <= 2*|c|*cap even before the cosine filter...
    val cap = 30
    val keyedPairs =
      SimilarityOps.semanticDupPairs(v, $"id" === 0L, -1.0, cap).count()
    assert(keyedPairs <= 2L * n * cap,
      s"budget exceeded: $keyedPairs > ${2L * n * cap}")
    assert(keyedPairs < n.toLong * (n - 1) / 2) // genuinely cut down
    // ...while near-threshold pairs (adjacent ranks) all survive: the
    // capped run finds exactly the uncapped verdicts here
    val capped =
      SimilarityOps.semanticDupPairs(v, $"id" === 0L, 0.999997, cap)
        .as[(Long, Long, Double)].collect().toSet
    assert(capped == uncapped)
    // a cap at/above the cluster size is EXACTLY the unchunked join
    val wide =
      SimilarityOps.semanticDupPairs(v, $"id" === 0L, 0.999997, n)
        .as[(Long, Long, Double)].collect().toSet
    assert(wide == uncapped)
    v.unpersist(): Unit
  }
}
