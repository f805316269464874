package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupIndexSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (0L until 60L).map { i =>
    val fam = i % 6
    (i, s"family $fam doc about topic $fam with shared phrasing " +
      s"alpha beta gamma delta unique token u$i tail epsilon zeta")
  }.toDF("doc_id", "text")

  test("digest index: probe finds exact dups on both scan paths") {
    val dir = tmpDir("digidx") + "/idx"
    DedupIndex.buildDigest(spark, dir, corpus, "doc_id", "text",
      rowsPerFile = 10)
    val ds = new graft.store.OrderedDataset(spark, dir)
    assert(ds.meta.files.size >= 4)
    // batch: exact copies of docs 3 and 17 (shifted ids) + one novel doc
    val batch = corpus.filter($"doc_id".isin(3L, 17L))
      .select(($"doc_id" + 1000L).as("doc_id"), $"text")
      .unionByName(Seq((2000L, "entirely novel text nothing shared"))
        .toDF("doc_id", "text"))
    val viaPoints = DedupIndex.probeDigest(spark, dir, batch,
      "doc_id", "text")
    val got = viaPoints.select("new_id", "corpus_id")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1003L, 3L), (1017L, 17L)))
    // zone-map path: the probe touches fewer index files than exist
    val filesRead = viaPoints.select(input_file_name()).distinct().count()
    assert(filesRead < ds.meta.files.size,
      s"expected pruning: $filesRead vs ${ds.meta.files.size}")
    // large-batch path (maxDriverKeys = 0 forces the full equi-join)
    val viaJoin = DedupIndex.probeDigest(spark, dir, batch,
      "doc_id", "text", maxDriverKeys = 0)
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(viaJoin == got)
  }

  test("digest index: incremental upsert extends the corpus") {
    val dir = tmpDir("digidx2") + "/idx"
    DedupIndex.buildDigest(spark, dir, corpus, "doc_id", "text",
      rowsPerFile = 10)
    // day 2: corpus grows by one new doc; only the delta is hashed
    DedupIndex.buildDigest(spark, dir,
      Seq((100L, "day two fresh document")).toDF("doc_id", "text"),
      "doc_id", "text", rowsPerFile = 10)
    val batch = Seq((5000L, "day two fresh document")).toDF("doc_id", "text")
    val got = DedupIndex.probeDigest(spark, dir, batch, "doc_id", "text")
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(got == Set((5000L, 100L)))
  }

  test("LSH band index: probe matches the index-free minhash pipeline") {
    val dir = tmpDir("lshidx") + "/idx"
    DedupIndex.buildMinhash(spark, dir, corpus, "doc_id", "text",
      shingleN = 3, numHashes = 12, bands = 4, rowsPerFile = 30)
    // batch: docs 7 and 23 with a short suffix (near-dups), disjoint ids
    val batch = corpus.filter($"doc_id".isin(7L, 23L))
      .select(($"doc_id" + 1000L).as("doc_id"),
        concat($"text", lit(" zq zq zq")).as("text"))
    val got = DedupIndex.probeMinhash(spark, dir, batch, corpus,
      "doc_id", "text", shingleN = 3, numHashes = 12, bands = 4,
      threshold = 0.5)
    val pairs = got.select("i", "j").as[(Long, Long)].collect().toSet
    assert(pairs.contains((7L, 1007L)) && pairs.contains((23L, 1023L)))
    // every verified pair is batch-vs-corpus with true Jaccard >= 0.5:
    // cross-check against the index-free formulation over the union
    val sh = DedupOps.shingleArrays(
      corpus.unionByName(batch), "doc_id", "text", 3)
    val sig = DedupOps.minhashSignature(sh, 12)
    val cand = DedupOps.lshCandidates(sig, 12, 4)
    val expect = DedupOps.jaccardVerify(cand, sh, 0.5)
      .filter($"j" >= 1000L && $"i" < 1000L)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(pairs == expect)
    // join path agrees
    val viaJoin = DedupIndex.probeMinhash(spark, dir, batch, corpus,
      "doc_id", "text", shingleN = 3, numHashes = 12, bands = 4,
      threshold = 0.5, maxDriverKeys = 0)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(viaJoin == pairs)
  }

  test("simhash index: two-level probe matches simhashPairs semantics") {
    val dir = tmpDir("simidx") + "/idx"
    // duplicate-heavy corpus: docs 50-52 share doc 0's text exactly, so
    // the distinct-fingerprint level holds ONE row for the whole family
    // and member expansion recovers every id
    val fam = corpus.filter($"doc_id" === 0L).select($"text").head.getString(0)
    val heavy = corpus
      .unionByName(Seq((50L, fam), (51L, fam)).toDF("doc_id", "text"))
    DedupIndex.buildSimhash(spark, dir, heavy, "doc_id", "text",
      rowsPerFile = 50)
    // batch: doc 0's text verbatim (dist 0 to the whole family) + novel
    val batch = Seq((1000L, fam),
      (1001L, "entirely novel text nothing shared zq"))
      .toDF("doc_id", "text")
    val got = DedupIndex.probeSimhash(spark, dir, batch,
      "doc_id", "text", maxDist = 3)
    val pairs = got.select("i", "j").as[(Long, Long)].collect().toSet
    // the exact-copy family is recovered through member expansion
    assert(Set((0L, 1000L), (50L, 1000L), (51L, 1000L)).subsetOf(pairs))
    // dist is 0 for exact copies
    assert(got.filter($"i" === 0L && $"j" === 1000L)
      .select("dist").head.getInt(0) == 0)
    // index-free reference: doc-level band join over corpus ∪ batch,
    // restricted to cross pairs
    val sim = DedupOps.simhash(heavy.unionByName(batch), "doc_id", "text")
    val expect = DedupOps.simhashPairs(sim, 3)
      .filter($"j" >= 1000L && $"i" < 1000L)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(pairs == expect)
    // join path agrees
    val viaJoin = DedupIndex.probeSimhash(spark, dir, batch,
      "doc_id", "text", maxDist = 3, maxDriverKeys = 0)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(viaJoin == pairs)
  }

  test("index builds tolerate short and null-text docs (no poison pill)") {
    val dir = tmpDir("nulldocs")
    val docs = Seq(
      (1L, "a full length document with plenty of words in it"),
      (2L, "tiny"),                       // < shingleN words: no bands
      (3L, null.asInstanceOf[String]))    // null text: no digest/fp
      .toDF("doc_id", "text")
    DedupIndex.buildDigest(spark, s"$dir/digest", docs, "doc_id", "text",
      rowsPerFile = 10)
    DedupIndex.buildMinhash(spark, s"$dir/lsh", docs, "doc_id", "text",
      shingleN = 3, numHashes = 12, bands = 4, rowsPerFile = 10)
    DedupIndex.buildSimhash(spark, s"$dir/sim", docs, "doc_id", "text",
      rowsPerFile = 10)
    // the un-indexable docs are simply absent; probes of them match
    // nothing (SQL equality semantics: null matches null never)
    val hits = DedupIndex.probeDigest(spark, s"$dir/digest",
      Seq((9L, null.asInstanceOf[String])).toDF("doc_id", "text"),
      "doc_id", "text")
    assert(hits.isEmpty)
    val full = DedupIndex.probeDigest(spark, s"$dir/digest",
      Seq((9L, "a full length document with plenty of words in it"))
        .toDF("doc_id", "text"), "doc_id", "text")
    assert(full.select("corpus_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("probing with mismatched build parameters fails fast") {
    val dir = tmpDir("cfgidx") + "/idx"
    DedupIndex.buildMinhash(spark, dir, corpus, "doc_id", "text",
      shingleN = 3, numHashes = 12, bands = 4, rowsPerFile = 100)
    val err = intercept[IllegalArgumentException] {
      DedupIndex.probeMinhash(spark, dir, corpus.limit(1), corpus,
        "doc_id", "text", shingleN = 3, numHashes = 12, bands = 6,
        threshold = 0.5)
    }
    assert(err.getMessage.contains("rebuild"))
    val err2 = intercept[IllegalArgumentException] {
      DedupIndex.probeDigest(spark, dir, corpus.limit(1),
        "doc_id", "text")
    }
    assert(err2.getMessage.contains("probed as 'digest'"))
  }

  test("embedding index: probe finds scaled copies via member fetch") {
    val dir = tmpDir("embidx") + "/idx"
    val vecs = (0L until 100L).map { i =>
      (i, Array.tabulate(8)(j => math.sin(i * 0.61 + j)))
    }.toDF("vec_id", "embedding")
    val v = SimilarityOps.withNorm(vecs, "vec_id", "embedding")
    val planes = SimilarityOps.hyperplanes(8, 8)
    DedupIndex.buildEmbedding(spark, dir, v, planes, planesPerBand = 2,
      rowsPerFile = 100)
    // batch: scaled copies of vectors 3 and 42 — cosine 1.0, same signs
    val batch = v.filter($"id".isin(3L, 42L))
      .select(($"id" + 1000L).as("id"),
        transform($"vec", x => x * lit(2.0)).as("vec"),
        ($"norm" * 2.0).as("norm"))
    val got = DedupIndex.probeEmbedding(spark, dir, batch, planes,
      planesPerBand = 2, threshold = 0.99)
    val pairs = got.select("i", "j").as[(Long, Long)].collect().toSet
    assert(pairs.contains((3L, 1003L)) && pairs.contains((42L, 1042L)))
    assert(got.filter($"i" === 3L && $"j" === 1003L)
      .select("cos").head.getDouble(0) == 1.0)
    // join path agrees
    val viaJoin = DedupIndex.probeEmbedding(spark, dir, batch, planes,
      planesPerBand = 2, threshold = 0.99, maxDriverKeys = 0)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(viaJoin == pairs)
  }

  test("embedding index: probe rejects an index its corpus has outgrown " +
      "(drift guard) and detects growth from the live sidecar count") {
    val dir = tmpDir("embdrift") + "/idx"
    def mkVecs(lo: Long, hi: Long) = SimilarityOps.withNorm(
      (lo until hi).map { i =>
        (i, Array.tabulate(8)(j => math.sin(i * 0.61 + j)))
      }.toDF("vec_id", "embedding"), "vec_id", "embedding")
    val planes = SimilarityOps.hyperplanes(8, 8) // 4 bands x 2 bits
    DedupIndex.buildEmbedding(spark, dir, mkVecs(0L, 100L), planes,
      planesPerBand = 2, rowsPerFile = 100)
    val batch = mkVecs(0L, 1L)
      .select(($"id" + 1000L).as("id"), $"vec", $"norm")
    // occupancy 100/2^2 = 25: fine under a 30-row cap...
    DedupIndex.probeEmbedding(spark, dir, batch, planes,
      planesPerBand = 2, threshold = 0.99,
      maxExpectedBucketRows = 30L).count(): Unit
    // ...then the corpus GROWS under the same index; the probe must
    // see the new occupancy (50) from the sidecar and name the remedy
    DedupIndex.buildEmbedding(spark, dir, mkVecs(100L, 200L), planes,
      planesPerBand = 2, rowsPerFile = 100)
    val e = intercept[IllegalArgumentException] {
      DedupIndex.probeEmbedding(spark, dir, batch, planes,
        planesPerBand = 2, threshold = 0.99,
        maxExpectedBucketRows = 30L)
    }
    assert(e.getMessage.contains("outgrown"), e.getMessage)
    assert(e.getMessage.contains("LshConfig.forCorpusSize"), e.getMessage)
  }

  test("embedding index drift guard binds at the NARROWEST band of a " +
      "ragged plane set") {
    val dir = tmpDir("embragged") + "/idx"
    val vecs = SimilarityOps.withNorm(
      (0L until 100L).map { i =>
        (i, Array.tabulate(8)(j => math.sin(i * 0.61 + j)))
      }.toDF("vec_id", "embedding"), "vec_id", "embedding")
    // 9 planes / 4 per band -> bands of 4, 4 and a ragged 1-bit band:
    // full-width occupancy 100/2^4 = 6.25 passes a 30-row cap, but the
    // 1-bit band runs at 100/2 = 50 — the guard must bind THERE
    // (mirroring requireUnsaturated), not at the full width
    val planes = SimilarityOps.hyperplanes(9, 8)
    DedupIndex.buildEmbedding(spark, dir, vecs, planes, planesPerBand = 4,
      rowsPerFile = 100)
    val batch = vecs.limit(1)
      .select(($"id" + 1000L).as("id"), $"vec", $"norm")
    val e = intercept[IllegalArgumentException] {
      DedupIndex.probeEmbedding(spark, dir, batch, planes,
        planesPerBand = 4, threshold = 0.99,
        maxExpectedBucketRows = 30L)
    }
    assert(e.getMessage.contains("narrowest"), e.getMessage)
    assert(e.getMessage.contains("1-bit"), e.getMessage)
  }

  test("embedding probe: over-bound batch downgrades the forced " +
      "broadcast to a planner join with identical results") {
    val dir = tmpDir("embbc") + "/idx"
    val vecs = (0L until 50L).map { i =>
      (i, Array.tabulate(8)(j => math.cos(i * 0.37 + j)))
    }.toDF("vec_id", "embedding")
    val v = SimilarityOps.withNorm(vecs, "vec_id", "embedding")
    val planes = SimilarityOps.hyperplanes(8, 8)
    DedupIndex.buildEmbedding(spark, dir, v, planes, planesPerBand = 2,
      rowsPerFile = 100)
    val batch = v.filter($"id".isin(3L, 7L, 11L))
      .select(($"id" + 500L).as("id"), $"vec", $"norm")
    def run(maxBc: Long) = DedupIndex.probeEmbedding(spark, dir, batch,
      planes, planesPerBand = 2, threshold = 0.99,
      maxBroadcastRows = maxBc)
      .select("i", "j").as[(Long, Long)].collect().toSet
    val viaBroadcast = run(1000000L)
    val viaPlanner = run(1L) // 3-row batch exceeds a 1-row bound
    assert(viaBroadcast == viaPlanner && viaBroadcast.nonEmpty)
  }

  test("segment index: incremental batches equal whole-corpus dedup") {
    val dir = tmpDir("segidx") + "/idx"
    def mkDoc(id: Long, words: Seq[String]) = (id, words.mkString(" "))
    val boiler = (0 until 10).map(i => s"b$i") // the shared block
    val corpus = Seq(
      mkDoc(1L, boiler ++ (0 until 10).map(i => s"c1x$i")),
      mkDoc(2L, boiler ++ (0 until 10).map(i => s"c2x$i")),
      mkDoc(3L, (0 until 10).map(i => s"only3$i"))).toDF("doc_id", "text")
    DedupIndex.buildSegments(spark, dir, corpus, "doc_id", "text",
      rowsPerFile = 100)
    // batch: one doc repeating the corpus boilerplate + a fresh doc
    val batch = Seq(
      mkDoc(100L, boiler ++ (0 until 10).map(i => s"n0x$i")),
      mkDoc(101L, (0 until 10).map(i => s"n1x$i"))).toDF("doc_id", "text")
    val got = DedupIndex.dedupBatchSegments(spark, dir, batch,
        "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    // whole-corpus reference restricted to the batch ids
    val exp = DedupOps.segmentDedup(corpus.unionByName(batch),
        "doc_id", "text")
      .filter($"doc_id" >= 100L).orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == exp)
    assert(got.head._3 == 1L) // the boilerplate block was dropped
    // extend the index with the batch; an intra-batch-only repeat in
    // the NEXT increment now pairs with generation-1 content
    DedupIndex.buildSegments(spark, dir, batch, "doc_id", "text",
      rowsPerFile = 100, incrementTag = Some("b1"))
    // replaying the same increment must NOT double-count
    DedupIndex.buildSegments(spark, dir, batch, "doc_id", "text",
      rowsPerFile = 100, incrementTag = Some("b1"))
    val batch2 = Seq(
      mkDoc(200L, (0 until 10).map(i => s"n0x$i") ++
        (0 until 10).map(i => s"f$i"))).toDF("doc_id", "text")
    val got2 = DedupIndex.dedupBatchSegments(spark, dir, batch2,
        "doc_id", "text")
      .as[(Long, Long, Long, String)].collect().head
    // doc 100's tail block ("n0x…") is now indexed with df=1; batch2
    // repeats it → total 2 → dropped; the fresh block survives
    assert(got2._2 == 2L && got2._3 == 1L)
    // join path (maxDriverKeys = 0) agrees
    val viaJoin2 = DedupIndex.dedupBatchSegments(spark, dir, batch2,
        "doc_id", "text", maxDriverKeys = 0)
      .as[(Long, Long, Long, String)].collect().head
    assert(viaJoin2 == got2)
  }
}
