package graft

import graft.agg.{AggFn, AggSpec, SegmentAgg}
import graft.store._
import org.apache.spark.sql.functions._
import java.time.LocalDateTime

/** The SURVEY §7.3 minimum slice as one narrative: a keyed weather
  * store (ref tutorial.rst:87-99 shape), an ordered write, an
  * overlapping correction upsert with keep-last dedup, a pruned range
  * read, and a tumbling aggregation over the result — the reference's
  * entire semantic core in ~40 lines of user code.
  */
class TutorialSpec extends SparkSpec {
  import spark.implicits._

  case class WeatherKey(country: String, city: String)
  implicit val ord: Ordering[WeatherKey] = Ordering.by(k => (k.country, k.city))
  val weatherIdx: Indexer[WeatherKey] = Indexer.of[WeatherKey](1)(
    k => Seq(Seq(k.country, k.city)))(
    l => l.head match {
      case Seq(co, ci) => Some(WeatherKey(co, ci)); case _ => None })

  test("write, upsert a correction, range-read, aggregate") {
    val store = new Store(spark, tmpDir("weather"), weatherIdx)
    val berlin = WeatherKey("germany", "berlin")
    def t(h: Int, m: Int) = LocalDateTime.of(2024, 3, 1, h, m)

    // 1. initial ordered write: one reading every 10 minutes
    val initial = (0 until 144).map { i =>
      (t(i / 6, (i % 6) * 10), 10.0 + (i % 24) * 0.5, 60L + i % 30)
    }.toDF("timestamp", "temperature", "humidity")
    store.get(berlin).write(initial,
      WriteOpts("timestamp", NRows(50)))
    assert(store.keys.toSeq == Seq(berlin))

    // 2. a correction batch overwrites the 08:00-09:00 readings
    val correction = (48 until 54).map { i =>
      (t(i / 6, (i % 6) * 10), -5.0, 99L)
    }.toDF("timestamp", "temperature", "humidity")
    store.get(berlin).write(correction,
      WriteOpts("timestamp", NRows(50),
        duplicatesOn = Some(Seq("timestamp")), maxNOffTargetRgs = Some(3)))

    val ds = store.get(berlin)
    assert(ds.df.count() == 144) // corrected in place, not appended

    // 3. pruned range read over the corrected window
    val eight = ds.rangeDF(
      Some(OrdVal.fromAny(t(8, 0))), Some(OrdVal.fromAny(t(9, 0))))
    assert(eight.count() == 6)
    assert(eight.agg(max("temperature")).head.getDouble(0) == -5.0)

    // 4. hourly tumbling aggregation over the whole dataset
    val hourly = SegmentAgg.aggregate(ds.orderedDf,
      SegmentAgg.timeBin(col("timestamp"), "1 hour"),
      Seq(AggSpec("t_min", "temperature", AggFn.Min),
        AggSpec("t_max", "temperature", AggFn.Max),
        AggSpec("t_first", "temperature", AggFn.First)),
      col("timestamp"))
      .orderBy("bin").collect()
    assert(hourly.length == 24)
    assert(hourly(8).getDouble(1) == -5.0) // corrected hour
    assert(hourly(9).getDouble(1) > 0)     // untouched hour
  }

  /** The training-data pipeline as one narrative: raw corpus → near-dup
    * detection → cluster resolution → keep-one-per-cluster → stratified
    * sampling → embed, quantize, index → similarity search. Every step
    * is a map-side or banded-join operator from graft.pipeline.
    */
  test("corpus: dedup, cluster, sample, quantize, index, search") {
    import graft.pipeline._
    // a corpus with one exact dup pair (0,40) and one near-dup of 1
    val base = (0L until 40L).map { i =>
      (i, s"the quick document number $i talks about topic ${i % 5} " +
        s"and repeats words ${(0 to 6).map(j => s"w${(i + j) % 11}").mkString(" ")}")
    }
    val docs = (base :+ (40L, base(0)._2) :+
      (41L, base(1)._2.replace("talks", "speaks")))
      .toDF("doc_id", "text")

    // 1. near-dup pairs (3-gram Jaccard >= 0.5) and cluster resolution
    val sh = DedupOps.shingleTable(docs, "doc_id", "text", 3).persist()
    val pairs = DedupOps.exactJaccardPairs(sh, 0.5).select("i", "j")
    val clusters = DedupOps.dupClusters(pairs)
    val c = clusters.as[(Long, Long)].collect().toMap
    assert(c(40L) == 0L)            // exact dup joins doc 0's cluster
    assert(c(41L) == 1L)            // near dup joins doc 1's cluster

    // 2. keep one doc per cluster (the min id = the cluster label)
    val keep = docs.join(clusters, docs("doc_id") === clusters("id"),
        "left")
      .filter(col("id").isNull || col("doc_id") === col("cluster"))
      .select("doc_id", "text")
    assert(keep.count() == 40)      // 42 docs - 2 cluster losers

    // 3. deterministic sample (reproducible across partitionings)
    val sampled = SampleOps.hashSample(keep, "doc_id", 0.5)
    assert(sampled.count() ==
      SampleOps.hashSample(keep.repartition(7), "doc_id", 0.5).count())

    // 4. embed (fake deterministic), quantize, store-backed IVF index
    val embedded = sampled.select(col("doc_id").as("vec_id"),
      transform(sequence(lit(0), lit(7)),
        j => (pmod(col("doc_id") * 31 + j * 7, lit(13)) - 6)
          .cast("float")).as("embedding"))
    val nq = SimilarityOps.normalizeQuantize(embedded, "vec_id",
      "embedding")
    assert(nq.columns.toSeq == Seq("id", "vn", "sc", "q"))
    val v = SimilarityOps.withNorm(embedded, "vec_id", "embedding")
      .persist()
    val idxDir = s"${tmpDir("corpus")}/ivf"
    IvfIndex.build(spark, idxDir, v, col("id") % 7 === 0,
      rowsPerFile = 10)

    // 5. search the index for the first sampled doc's neighbors
    val q = v.limit(1)
    val hits = IvfIndex.search(spark, idxDir, q,
      v.filter(col("id") % 7 === 0), nProbe = 2, k = 3).collect()
    assert(hits.length <= 3 && hits.nonEmpty)
    assert(hits.map(_.getInt(1)).toSeq == (1 to hits.length)) // ranks
  }

  /** Day 2 of the same pipeline: the corpus is INDEXED once; each new
    * increment is cleaned, then deduplicated against the index without
    * touching corpus text again — the shape that stays affordable when
    * the corpus is 100 TB and the increment is 0.1% of it.
    */
  test("corpus day 2: clean the increment, dedup it against the index") {
    import graft.pipeline._
    val corpus = (0L until 40L).map { i =>
      (i, s"stable corpus document $i about subject ${i % 4} " +
        s"${(0 to 5).map(j => s"t${(i * 3 + j) % 9}").mkString(" ")}")
    }.toDF("doc_id", "text")
    val dir = tmpDir("day2")
    DedupIndex.buildDigest(spark, s"$dir/digest", corpus,
      "doc_id", "text", rowsPerFile = 10)
    DedupIndex.buildMinhash(spark, s"$dir/lsh", corpus, "doc_id", "text",
      shingleN = 3, numHashes = 12, bands = 4, rowsPerFile = 40)

    // the increment: a re-crawl of doc 7 (exact), a lightly edited doc
    // 3 (near-dup), one genuinely new doc — with scrubbable noise
    val increment = Seq(
      (1007L, corpus.filter($"doc_id" === 7L).head.getString(1)),
      (1003L, corpus.filter($"doc_id" === 3L).head.getString(1)
        + " zz yy"),
      (1099L, "entirely new material visit https://ex.org/x for more"))
      .toDF("doc_id", "text")
    val cleaned = increment.select($"doc_id",
      TextOps.normalizeWs(TextOps.scrubUrls($"text")).as("text"))
    assert(cleaned.filter($"doc_id" === 1099L).head.getString(1)
      .contains("<URL>"))

    // exact dups leave via the digest probe; near-dups via the LSH probe
    val exact = DedupIndex.probeDigest(spark, s"$dir/digest", cleaned,
      "doc_id", "text")
    assert(exact.select("new_id", "corpus_id").as[(Long, Long)]
      .collect().toSet == Set((1007L, 7L)))
    val near = DedupIndex.probeMinhash(spark, s"$dir/lsh", cleaned,
      corpus, "doc_id", "text", shingleN = 3, numHashes = 12, bands = 4,
      threshold = 0.5)
    assert(near.select("i", "j").as[(Long, Long)].collect().toSet
      .contains((3L, 1003L)))
    // what survives both probes is the true delta to ingest
    val dupIds = exact.select($"new_id").unionByName(
      near.select($"j".as("new_id"))).distinct()
    val fresh = cleaned.join(dupIds,
      cleaned("doc_id") === dupIds("new_id"), "left_anti")
    assert(fresh.select("doc_id").as[Long].collect().toSet == Set(1099L))
  }

  /** Day 3 — corpus finalization: decontaminate against the eval
    * benchmark, drop repetition-degenerate docs, cap each stratum, and
    * pack what's left into fixed-token-budget training chunks. Every
    * step is map-side or a keyed window/banded join from
    * graft.pipeline — no global sort, no all-pairs work anywhere.
    */
  test("corpus day 3: decontaminate, filter, cap, pack") {
    import graft.pipeline._
    val corpus = ((0L until 60L).map { i =>
      (i, s"train doc $i topic ${i % 3} " +
        s"${(0 to 9).map(j => s"k${(i * 7 + j) % 23}").mkString(" ")}")
    } :+ (60L, "leak leak " + "eval secret five gram phrase") :+
      (61L, ("spam " * 12).trim + " filler")) // degenerate repetition
      .toDF("doc_id", "text")
    val eval = Seq((9000L, "held out eval secret five gram phrase doc"))
      .toDF("doc_id", "text")

    // 1. decontaminate: any train doc sharing a word 5-gram with eval
    val dirty = ContaminationOps.overlap(corpus, eval,
      "doc_id", "text", 5)
    assert(dirty.select("id").as[Long].collect().toSet == Set(60L))
    val decon = corpus.join(dirty.select($"id"),
      corpus("doc_id") === dirty("id"), "left_anti")

    // 2. repetition filter: drop docs dominated by one bigram
    val rep = TextOps.repetitionDF(decon, "doc_id", "text")
    val keepIds = rep.filter($"top_frac" < 0.5 && $"dup_word_frac" < 0.5)
      .select($"id")
    assert(!keepIds.as[Long].collect().contains(61L))
    val kept = decon.join(keepIds,
      decon("doc_id") === keepIds("id"), "left_semi")

    // 3. cap each topic stratum deterministically
    val strat = kept.withColumn("topic",
      concat(lit("t"), $"doc_id" % 3))
    val capped = SampleOps.capPerGroup(strat, $"topic", "doc_id", 15)
    val perTopic = capped.groupBy("topic").count()
      .as[(String, Long)].collect().toMap
    assert(perTopic.values.forall(_ <= 15))

    // 4. pack into 64-token chunks across 4 shards
    val packed = PackOps.packChunks(capped, "doc_id",
      size(split($"text", " ")), shards = 4, capacity = 64)
    // offsets are contiguous within each shard: next start = prev end
    val rows = packed.select("shard", "start_off", "n_tokens")
      .orderBy("shard", "start_off")
      .as[(Long, Long, Long)].collect()
    rows.groupBy(_._1).values.foreach { sh =>
      sh.sliding(2).foreach {
        case Array((_, s1, n1), (_, s2, _)) => assert(s2 == s1 + n1)
        case _ => ()
      }
    }
    // every chunk index within a shard is covered with no gaps
    val chunks = packed.select("shard", "chunk_first", "chunk_last")
      .as[(Long, Long, Long)].collect()
    chunks.groupBy(_._1).values.foreach { sh =>
      val covered = sh.flatMap(c => c._2 to c._3).toSet
      assert(covered == (0L to covered.max).toSet)
    }
  }

  /** Day 4 — the crawl goes continuous: the nightly increment becomes a
    * stream, and dedup moves INTO the ingest path. Each micro-batch is
    * probed against the digest index (cost ∝ batch, flat in corpus
    * size) and only fresh content reaches the corpus — the corpus and
    * its index stay consistent through restarts because both commits
    * are keep-last-idempotent under replay.
    */
  test("corpus day 4: continuous ingest dedups against the index in-stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{Doc, StreamingDedup}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmpDir("day4")
    val corpus = s"$dir/corpus"; val index = s"$dir/index"

    // hour 1-2 of the firehose: fresh docs plus a syndicated article
    // that arrives twice (ids 5 and 105 carry identical text)
    val feed = MemoryStream[Doc]
    feed.addData((0L until 10L).map(i => Doc(i, s"breaking story $i")))
    feed.addData((100L until 110L).map(i =>
      Doc(i, if (i == 105L) "breaking story 5" else s"evening story $i")))
    StreamingDedup.run(feed.toDF(), "doc_id", "text", corpus, index,
      s"$dir/ckpt", rowsPerFile = 8).awaitTermination()

    // the syndicated copy was caught by the cross-batch index probe
    val ids = new graft.store.OrderedDataset(spark, corpus).df
      .select("doc_id").as[Long].collect().toSet
    assert(ids == ((0L until 10L) ++ (100L until 110L)).toSet - 105L)

    // day 5's batch job treats the streamed corpus like any dataset:
    // same store, same probe economics as day 2
    val accepted = StreamingDedup.dedupBatch(spark,
      Seq(Doc(500L, "breaking story 5"), Doc(501L, "genuinely new")).toDF(),
      "doc_id", "text", corpus, index, rowsPerFile = 8)
    assert(accepted == 1)
  }

  /** Day 5 — operating the live corpus: a bad crawl day recalled in
    * place (fully-covered files dropped by a metadata-only commit),
    * the next append carrying a freshly-learned quality column
    * (additive evolution, old docs read null), and the operational
    * checks — row count, id frontier — answered straight from the
    * sidecar without opening a single file.
    */
  test("corpus day 5: purge a recall, evolve the schema, stats-only checks") {
    val dir = tmpDir("day5") + "/corpus"
    val ds = new OrderedDataset(spark, dir)
    // the corpus so far: three crawl days, 100 docs each, 50/file
    ds.write((0L until 300L).map(i => (i, s"doc $i body"))
      .toDF("doc_id", "text"), WriteOpts("doc_id", NRows(50)))
    // day 2's crawl (ids 100-199) is recalled — a poisoned source
    val rep = ds.delete(Some(OrdLong(100L)), Some(OrdLong(200L)))
    assert(rep.filesDropped == 2 && rep.filesRewritten == 0)
    assert(ds.df.count() == 200)
    // day 4's append brings the new quality score with it
    ds.write((300L until 350L).map(i => (i, s"doc $i body", i % 5 / 4.0))
      .toDF("doc_id", "text", "quality"),
      WriteOpts("doc_id", NRows(50), mergeSchema = true))
    assert(ds.df.filter($"quality".isNull).count() == 200)
    // dashboard checks run metadata-only (LocalRelation, zero scans)
    graft.sources.GraftStatsAgg.register(spark)
    val stats = graft.sources.GraftSource.table(spark, dir).agg(
      count(lit(1)).as("n"),
      min("doc_id").as("lo"), max("doc_id").as("hi"))
    assert(stats.queryExecution.optimizedPlan.collectFirst {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }.nonEmpty)
    assert(stats.head() == org.apache.spark.sql.Row(250L, 0L, 349L))
  }

  /** Day 6 — the corpus ships: score once, curate proportionally,
    * spend a token budget, and lay the survivors out in a
    * reproducible training order. Every step is a deterministic pure
    * function of (id, text), so rebuilding the corpus tomorrow — or
    * on a different cluster — yields byte-identical training files.
    */
  test("corpus day 6: score, curate, budget, shuffle into training order") {
    import graft.pipeline._
    val corpus = (0L until 120L).map { i =>
      val lang = if (i % 3 == 0) "en" else "de"
      (i, lang, s"doc $i lang $lang " +
        (0 to (i % 7).toInt).map(j => s"w${(i * 11 + j) % 31}")
          .mkString(" "))
    }.toDF("doc_id", "lang", "text")

    // 1. one scoring pass; lang and the token count ride through the
    // projection (no self-join to reunite them with the score)
    val scored = TextOps.classifierScoreDF(
      corpus.withColumn("n_tokens",
        size(split($"text", " ")).cast("long")),
      "doc_id", "text", keep = Seq("lang", "n_tokens"))

    // 2. keep the best half of every language (integer-exact ceil)
    val curated = SampleOps.topFracPerGroup(scored, $"lang",
      Seq($"w_sum".desc, $"doc_id"), 1, 2)
    val byLang = corpus.groupBy("lang").count().as[(String, Long)]
      .collect().toMap
    val keptByLang = curated.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    byLang.foreach { case (l, n) =>
      assert(keptByLang(l) == (n + 1) / 2) }

    // 3. spend a per-shard token budget on the best survivors
    val budgeted = SampleOps.tokenBudgetPerShard(curated, "doc_id",
      $"n_tokens", Seq($"w_sum".desc), shards = 4, budgetPerShard = 40L)
    assert(budgeted.groupBy("shard").agg(max("cum_tokens"))
      .as[(Long, Long)].collect().forall(_._2 <= 40L))

    // 4. deterministic training order: (shard, pos) is a pure function
    // of the surviving ids — identical however the job was partitioned
    val coords = SampleOps.shuffleCoords(budgeted, "doc_id", 4)
      .select("doc_id", "shard", "pos")
      .as[(Long, Long, Long)].collect().toSet
    val again = SampleOps.shuffleCoords(
        budgeted.repartition(13), "doc_id", 4)
      .select("doc_id", "shard", "pos")
      .as[(Long, Long, Long)].collect().toSet
    assert(again == coords)
  }

  /** Day 7 — operate the corpus like a production table: batches
    * stream in through the native sink (exactly-once, no dedup key
    * needed), the cardinality dashboard reads NDV from sidecar
    * sketches without touching data, a poisoned ingest of
    * corpus + index rolls back as one transaction, and a bad manual
    * commit is undone with restore-to-version.
    */
  test("corpus day 8: a week of crawl increments — segment adds, " +
      "bounded amplification, one fold") {
    import graft.pipeline.{DedupIndex, IndexSegments}
    val dir = tmpDir("day8") + "/digest"
    def crawl(day: Int) = (0 until 30).map { i =>
      (day * 1000L + i, s"day $day doc $i body with words w${i % 9}")
    }.toDF("doc_id", "text")
    // day 0 builds the base run; days 1..6 are O(increment) delta
    // segments — the base is never rewritten by an add
    DedupIndex.buildDigest(spark, dir, crawl(0), "doc_id", "text", 50)
    val genAfterBuild = new OrderedDataset(spark, dir).generation
    (1 to 6).foreach { d =>
      DedupIndex.buildDigest(spark, dir, crawl(d), "doc_id", "text", 50)
      // operational knob: fold once amplification reaches the bound
      DedupIndex.compactIndexIfNeeded(spark, dir, maxSegments = 4): Unit
    }
    assert(new OrderedDataset(spark, dir).generation != genAfterBuild ||
      IndexSegments.liveParts(spark, dir).size > 1) // one fold happened
    // day-4's fold kept probes exact throughout: an exact copy of a
    // day-2 doc (folded) and a day-6 doc (still a live segment) both hit
    val batch = Seq((99990L, "day 2 doc 7 body with words w7"),
      (99991L, "day 6 doc 3 body with words w3"),
      (99992L, "never seen before")).toDF("doc_id", "text")
    val hits = DedupIndex.probeDigest(spark, dir, batch, "doc_id", "text")
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(hits == Set((99990L, 2007L), (99991L, 6003L)))
    // read amplification stayed bounded by the knob
    assert(IndexSegments.liveParts(spark, dir).size <= 4 + 1)
  }

  test("corpus day 9: one whole crawl day — probe, decontaminate, " +
      "dedup, add survivors as segments, pinned reads throughout") {
    import graft.pipeline.{Bm25Index, ContaminationOps, DedupIndex,
      IndexSegments, RetrievalOps}
    val root = tmpDir("day9")
    // yesterday's state: an eval benchmark, a curated corpus, and its
    // three indexes (the p_crawl_day loop in user code)
    val eval = Seq((900L, "held out benchmark question about topic t3"))
      .toDF("doc_id", "text")
    val corpus = (0L until 40L).map(i =>
      (i, s"corpus doc $i about topic t${i % 5} words w${i % 7}"))
      .toDF("doc_id", "text")
    ContaminationOps.buildIndex(spark, s"$root/contam", eval,
      "doc_id", "text", 3, rowsPerFile = 100)
    DedupIndex.buildDigest(spark, s"$root/digest", corpus,
      "doc_id", "text", 50)
    Bm25Index.build(spark, s"$root/bm25", corpus, "doc_id", "text", 50)
    // an analyst pins the index for a long report session BEFORE the
    // day's churn: every probe below reads yesterday's version
    val pin = DedupIndex.pinIndex(spark, s"$root/bm25", Bm25Index.Kind)
    // today's crawl: two clean docs, one exact re-crawl of corpus doc
    // 7, one doc quoting the benchmark (contaminated)
    val crawl = Seq(
      (1000L, "fresh doc about topic t1 never seen"),
      (1001L, "another fresh doc about topic t4"),
      (1002L, "corpus doc 7 about topic t2 words w0"),
      (1003L, "quotes the held out benchmark question about topic t3"))
      .toDF("doc_id", "text")
    val contaminated = ContaminationOps.probeIndex(spark,
        s"$root/contam", crawl, "doc_id", "text", 3)
      .select(col("id").as("doc_id"))
    val clean = crawl.join(contaminated, Seq("doc_id"), "left_anti")
    val dups = DedupIndex.probeDigest(spark, s"$root/digest", clean,
        "doc_id", "text")
      .select(col("new_id").as("doc_id")).distinct()
    val survivors = clean.join(dups, Seq("doc_id"), "left_anti")
    assert(survivors.select("doc_id").as[Long].collect().toSet ==
      Set(1000L, 1001L)) // re-crawl deduped, quote decontaminated
    // survivors extend both indexes as O(increment) delta segments,
    // with read amplification self-bounded
    Bm25Index.add(spark, s"$root/bm25", survivors, "doc_id", "text", 50,
      maxSegments = Some(4))
    DedupIndex.buildDigest(spark, s"$root/digest", survivors,
      "doc_id", "text", 50, maxSegments = Some(4))
    // fresh reads see the grown corpus; the analyst's pin does not
    val q = Seq((0L, "topic t1 doc")).toDF("q_id", "q_text")
    val freshIds = Bm25Index.topK(spark, s"$root/bm25", q, 5)
      .select("doc_id").as[Long].collect().toSet
    assert(freshIds.contains(1000L))
    val pinnedIds = Bm25Index.topK(pin, q, 5, RetrievalOps.K1,
        RetrievalOps.B, 65536)
      .select("doc_id").as[Long].collect().toSet
    assert(!pinnedIds.contains(1000L) && !pinnedIds.contains(1001L))
    assert(IndexSegments.totalRows(pin) <
      IndexSegments.totalRows(
        DedupIndex.pinIndex(spark, s"$root/bm25", Bm25Index.Kind)))
  }

  test("corpus day 10: a recall — purge the corpus, take down the " +
      "indexes, block re-arrivals") {
    import graft.pipeline.{Bm25Index, DedupIndex}
    import graft.streaming.StreamingDedup
    val root = tmpDir("day10")
    // the accepted corpus is CONTENT-ADDRESSED (ordered on the digest
    // hkey — the StreamingDedup layout), with its digest index and a
    // BM25 index serving retrieval
    val docsIn = (0L until 30L).map(i =>
      (i, s"stored doc $i about subject s${i % 5} detail d$i"))
      .toDF("doc_id", "text")
    val ingested = StreamingDedup.dedupBatch(spark, docsIn, "doc_id",
      "text", s"$root/corpus", s"$root/digest", rowsPerFile = 50)
    assert(ingested == 30L)
    Bm25Index.build(spark, s"$root/bm25",
      new OrderedDataset(spark, s"$root/corpus").df
        .select("doc_id", "text"), "doc_id", "text", 50)
    // a takedown notice arrives for doc 7's content
    val recalled = new OrderedDataset(spark, s"$root/corpus").df
      .filter($"doc_id" === 7L).select("doc_id", "text", "digest",
        "hkey").persist()
    try {
      val hk = recalled.select("hkey").as[Long].head()
      // 1. PURGE the corpus row: content addressing makes a recall a
      //    zone-map range delete — [hkey, hkey+1) touches at most the
      //    files actually holding that digest (day-5's machinery)
      new OrderedDataset(spark, s"$root/corpus")
        .delete(Some(graft.store.OrdLong(hk)),
          Some(graft.store.OrdLong(hk + 1))): Unit
      assert(new OrderedDataset(spark, s"$root/corpus").df
        .filter($"doc_id" === 7L).isEmpty)
      // 2. TAKE DOWN the indexes: without this they keep SERVING the
      //    purged id (tombstones — O(1 id), no index rewrite)
      DedupIndex.removeDocs(spark, s"$root/digest",
        Seq(7L).toDF("id")): Unit
      DedupIndex.removeDocs(spark, s"$root/bm25",
        Seq(7L).toDF("id")): Unit
      val q = Seq((0L, "subject s2 detail d7")).toDF("q_id", "q_text")
      assert(!Bm25Index.topK(spark, s"$root/bm25", q, 10)
        .select("doc_id").as[Long].collect().contains(7L))
      // 3. BLOCK re-arrivals: the recalled CONTENT goes into a
      //    blocklist; tomorrow's crawl re-surfaces the same text under
      //    a new id and it never enters — while a genuinely new doc
      //    lands normally
      DedupIndex.buildDigest(spark, s"$root/block",
        recalled.select("doc_id", "text"), "doc_id", "text", 50)
      val tomorrow = recalled
        .select(($"doc_id" + 500L).as("doc_id"), $"text")
        .unionByName(Seq((600L, "a genuinely new doc about subject s9"))
          .toDF("doc_id", "text"))
      val accepted = StreamingDedup.dedupBatch(spark, tomorrow,
        "doc_id", "text", s"$root/corpus", s"$root/digest",
        rowsPerFile = 50, blockIndexDir = Some(s"$root/block"))
      assert(accepted == 1L, "the re-crawl of recalled content must " +
        "be blocked; the new doc must land")
      val ids = new OrderedDataset(spark, s"$root/corpus").df
        .select("doc_id").as[Long].collect().toSet
      assert(ids.contains(600L) && !ids.contains(507L) &&
        !ids.contains(7L))
    } finally recalled.unpersist(): Unit
  }

  /** Day 11 — benchmark hygiene at the door: eval suites are living
    * artifacts, and leaks arrive EDITED, not verbatim. The day-3
    * exact screen catches word-for-word leaks; a paraphrase that
    * inserts a filler every few words dodges every 5-gram while still
    * sharing a third of its shingles — whole-doc similarity is the
    * signal, and the fuzzy screen thresholds on it. Benchmark v2
    * lands as an O(increment) segment add to the persisted screen,
    * exactly like a crawl increment lands in the digest index.
    */
  test("corpus day 11: a paraphrased benchmark leak dodges the " +
      "5-gram screen; the fuzzy screen catches it; benchmark v2 " +
      "lands incrementally") {
    import graft.pipeline.{ContaminationOps, DedupIndex}
    val w = (0 until 24).map(i => s"w$i")
    val evalV1 = Seq((9000L, w.mkString(" "))).toDF("doc_id", "text")
    // the paraphrase: a filler token after every 4th word — no run of
    // 5 original words survives, so the exact 5-gram overlap is ZERO
    val para = w.grouped(4).zipWithIndex
      .map { case (g, i) => (g :+ s"zz$i").mkString(" ") }
      .mkString(" ")
    val crawl = Seq(
      (1L, w.mkString(" ")), // verbatim leak
      (2L, para), // paraphrased leak
      (3L, "clean doc " + (0 until 22).map(i => s"c$i").mkString(" ")))
      .toDF("doc_id", "text")
    val exact = ContaminationOps.overlap(crawl, evalV1,
      "doc_id", "text", 5)
    assert(exact.select("id").as[Long].collect().toSet == Set(1L),
      "the 5-gram screen sees only the verbatim leak")
    // fuzzy screen at threshold 0.3: band width is the recall knob —
    // 12 one-row bands catch low-Jaccard pairs (P ≈ 1-(1-j)^12);
    // the exact verify keeps precision 1.0 at ANY banding
    val fz = ContaminationOps.fuzzyOverlap(crawl, evalV1,
        "doc_id", "text", 3, 12, 12, 0.3)
      .as[(Long, Long, Double)].collect()
    assert(fz.map(_._1).toSet == Set(1L, 2L),
      s"fuzzy screen must flag both leaks and only them: ${fz.toSeq}")
    val byId = fz.map(t => t._1 -> t._3).toMap
    assert(byId(1L) == 1.0)
    assert(byId(2L) > 0.3 && byId(2L) < 0.6,
      s"the paraphrase shares about a third of its shingles: $byId")
    // persist the screen; benchmark v2 lands as a segment add and the
    // next batch is screened against BOTH versions in one probe
    val dir = tmpDir("day11") + "/fuzzyscreen"
    DedupIndex.buildMinhash(spark, dir, evalV1, "doc_id", "text",
      shingleN = 3, numHashes = 12, bands = 12, rowsPerFile = 500)
    val v2 = (0 until 24).map(i => s"v$i")
    val evalV2 = Seq((9100L, v2.mkString(" "))).toDF("doc_id", "text")
    DedupIndex.buildMinhash(spark, dir, evalV2, "doc_id", "text",
      shingleN = 3, numHashes = 12, bands = 12, rowsPerFile = 500)
    val paraV2 = v2.grouped(4).zipWithIndex
      .map { case (g, i) => (g :+ s"yy$i").mkString(" ") }
      .mkString(" ")
    val batch2 = Seq((10L, paraV2),
      (11L, "another clean doc " + (0 until 22).map(i => s"d$i")
        .mkString(" "))).toDF("doc_id", "text")
    val hits = DedupIndex.probeMinhash(spark, dir, batch2,
        evalV1.unionByName(evalV2), "doc_id", "text", 3, 12, 12, 0.3)
      .select("j", "i").as[(Long, Long)].collect().toSet
    assert(hits == Set((10L, 9100L)),
      s"the v2 paraphrase must hit the incrementally-added version " +
        s"and nothing else: $hits")
  }

  test("corpus day 7: stream in, watch NDV, roll back, restore") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val base = tmpDir("day7")
    val dir = s"$base/corpus"

    // 1. crawl batches arrive via writeStream.format("graft"); a
    // replayed epoch (crash between commit and checkpoint) commits
    // nothing twice
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val feed = MemoryStream[(Long, String, Long)]
    feed.addData((0L until 400L).map(i =>
      (i, s"doc $i body", i % 97)))
    val q = feed.toDF().toDF("doc_id", "text", "source_id")
      .writeStream.format("graft")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$base/ckpt")
      .option("ordered_on", "doc_id")
      .option("target_rows", "100")
      .option("sketch_cols", "source_id") // NDV sketches from batch one
      .start(dir)
    q.awaitTermination()
    val ds = new OrderedDataset(spark, dir)
    assert(ds.df.count() === 400)

    // 2. cardinality dashboard: source_id was sketched at write time
    // (sink option); doc_id is retrofitted by reading only the files
    // missing it. NDV queries are then pure sidecar math — no Spark
    // job, however big the corpus gets.
    ds.backfillSketches(Seq("source_id", "doc_id")): Unit
    assert(math.abs(ds.approxDistinct("source_id") - 97L) <= 5L)
    assert(math.abs(ds.approxDistinct("doc_id") - 400L) <= 20L)

    // 3. a nightly ingest updates corpus AND digest index together;
    // validation fails -> both revert, nothing half-applied
    val st = new Store(spark, base,
      Indexer.of[String](1)(k => Seq(Seq(k)))(l =>
        if (l.head.size == 1) Some(l.head.head) else None))(
      Ordering.String)
    val preGen = ds.meta.generation
    intercept[RuntimeException] {
      st.transaction(Seq("corpus", "digest_index")) { t =>
        t("corpus").write((400L until 500L).map(i =>
            (i, s"doc $i body", i % 97))
          .toDF("doc_id", "text", "source_id"),
          WriteOpts("doc_id", NRows(100)))
        t("digest_index").write((400L until 500L).map(i =>
            (i, s"h$i")).toDF("doc_id", "digest"),
          WriteOpts("doc_id", NRows(100)))
        throw new RuntimeException("validation: contamination spike")
      }
    }
    assert(ds.df.count() === 400) // corpus reverted
    assert(!st.get("digest_index").exists) // created index removed
    assert(ds.meta.generation > preGen) // revert is itself a commit

    // 4. a direct bad commit (wrong dedup key wiped rows) — undo it
    val before = ds.meta.generation
    ds.write(
      (0L until 400L).map(i => (i, "CLOBBERED", i % 97))
        .toDF("doc_id", "text", "source_id"),
      WriteOpts("doc_id", NRows(100), duplicatesOn = Some(Seq("doc_id"))))
    assert(ds.df.filter($"text" === "CLOBBERED").count() === 400)
    ds.restoreTo(before)
    assert(ds.df.filter($"text" === "CLOBBERED").count() === 0)
    assert(ds.df.count() === 400)
  }
}
