package graft.streaming

import graft.SparkSpec
import graft.store.OrderedDataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

final case class Doc(doc_id: Long, text: String)

/** StreamingDedup: chunked ingest with cross-batch duplicates and a
  * mid-stream restart must converge to one-shot exact dedup keeping
  * the min id per digest — and the day-2 re-crawl must be rejected by
  * the index probe without growing the corpus.
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  // 40 distinct texts; ids interleave so most digests arrive more than
  // once, including across chunk boundaries, with the min id first
  // (ascending-id chunking — the contract the oracle states).
  def mkDocs(): Seq[Doc] = {
    val texts = (0 until 40).map(i => s"document body number ${i % 40} " +
      s"with shared filler words ${"x " * (i % 5)}")
    (0 until 100).map(i => Doc(i.toLong, texts(i % 40)))
  }

  test("chunked ingest + restart equals one-shot min-id dedup; re-crawl adds nothing") {
    val dir = tmpDir("sdedup")
    val corpus = s"$dir/corpus"; val index = s"$dir/index"
    val ckpt = s"$dir/ckpt"
    val docs = mkDocs()

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // phase 1: two chunks, then the query terminates (AvailableNow)
    val m1 = MemoryStream[Doc]
    m1.addData(docs.slice(0, 30))
    m1.addData(docs.slice(30, 55))
    StreamingDedup.run(m1.toDF(), "doc_id", "text", corpus, index, ckpt,
      rowsPerFile = 16).awaitTermination()

    // phase 2: NEW query, same checkpoint; the source re-presents the
    // committed blocks (skipped via offsets) plus the rest of day 1
    val m2 = MemoryStream[Doc]
    m2.addData(docs.slice(0, 30))
    m2.addData(docs.slice(30, 55))
    m2.addData(docs.slice(55, 100))
    StreamingDedup.run(m2.toDF(), "doc_id", "text", corpus, index, ckpt,
      rowsPerFile = 16).awaitTermination()

    val expected = docs.groupBy(_.text).map(_._2.minBy(_.doc_id))
      .toSeq.sortBy(_.doc_id)
    val got = new OrderedDataset(spark, corpus).df
      .select("doc_id", "text").as[Doc].collect().toSeq.sortBy(_.doc_id)
    assert(got == expected)
    assert(got.size == 40)

    // day-2 re-crawl: every digest already indexed → zero accepted,
    // corpus byte-identical (file set unchanged, not just row set)
    val filesBefore = new OrderedDataset(spark, corpus).meta.files
    val accepted = StreamingDedup.dedupBatch(spark, docs.toDF(),
      "doc_id", "text", corpus, index, rowsPerFile = 16)
    assert(accepted == 0)
    assert(new OrderedDataset(spark, corpus).meta.files == filesBefore)

    // index invariant: one row per distinct digest, aligned with corpus
    val idxRows = new OrderedDataset(spark, index).df
    assert(idxRows.select("digest").distinct().count() == 40)
    assert(idxRows.count() == 40)
  }

  test("null-text docs form one dedup group across batches (GROUP BY semantics)") {
    val dir = tmpDir("sdedup3")
    val corpus = s"$dir/corpus"; val index = s"$dir/index"
    // batch 1: one null-text doc + one real doc — both accepted
    val a1 = StreamingDedup.dedupBatch(spark,
      Seq(Doc(5L, null), Doc(1L, "real text")).toDF(), "doc_id", "text",
      corpus, index, rowsPerFile = 8)
    assert(a1 == 2)
    // batch 2: another null-text doc and a re-crawl of the real one —
    // both are duplicates (null texts share the sentinel digest group,
    // exactly like DuckDB's GROUP BY md5(text) groups NULLs)
    val a2 = StreamingDedup.dedupBatch(spark,
      Seq(Doc(9L, null), Doc(2L, "real text")).toDF(), "doc_id", "text",
      corpus, index, rowsPerFile = 8)
    assert(a2 == 0)
    val ids = new OrderedDataset(spark, corpus).df
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(5L, 1L))
  }

  test("in-stream decontamination rejects benchmark-overlapping docs at the door") {
    val dir = tmpDir("sdedup-contam")
    val corpus = s"$dir/corpus"; val index = s"$dir/index"
    val contam = s"$dir/contam"
    // the held-out benchmark, indexed once
    graft.pipeline.ContaminationOps.buildIndex(spark,
      contam,
      Seq((9000L, "secret held out benchmark phrase for eval only"))
        .toDF("doc_id", "text"),
      "doc_id", "text", n = 5, rowsPerFile = 50)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val feed = MemoryStream[Doc]
    feed.addData(Seq(
      Doc(1L, "perfectly ordinary training document one"),
      // shares a 5-gram with the benchmark -> must be rejected
      Doc(2L, "contains the secret held out benchmark phrase for sure"),
      Doc(3L, "another ordinary training document three"),
      Doc(4L, "perfectly ordinary training document one"))) // dup of 1
    StreamingDedup.run(feed.toDF(), "doc_id", "text", corpus, index,
      s"$dir/ckpt", rowsPerFile = 8,
      contamIndexDir = Some(contam), contamN = 5).awaitTermination()

    val ids = new OrderedDataset(spark, corpus).df
      .select("doc_id").as[Long].collect().toSet
    assert(ids === Set(1L, 3L)) // 2 contaminated, 4 deduped
    // and the contaminated digest must NOT have entered the index:
    // a later clean re-submission under a new id is accepted
    val again = StreamingDedup.dedupBatch(spark,
      Seq(Doc(10L, "contains the secret held out benchmark phrase for sure"))
        .toDF(), "doc_id", "text", corpus, index, rowsPerFile = 8)
    assert(again === 1) // no contamination filter on this call
  }

  test("a batch overlapping only the index (not itself) is filtered row-exactly") {
    val dir = tmpDir("sdedup2")
    val corpus = s"$dir/corpus"; val index = s"$dir/index"
    val day1 = (0 until 20).map(i => Doc(i.toLong, s"unique text $i"))
    StreamingDedup.dedupBatch(spark, day1.toDF(), "doc_id", "text",
      corpus, index, rowsPerFile = 8): Unit
    // day 2: 5 true dups of day-1 texts (new ids) + 5 fresh docs
    val day2 = (0 until 5).map(i => Doc(100L + i, s"unique text $i")) ++
      (0 until 5).map(i => Doc(200L + i, s"fresh day2 text $i"))
    val accepted = StreamingDedup.dedupBatch(spark, day2.toDF(),
      "doc_id", "text", corpus, index, rowsPerFile = 8)
    assert(accepted == 5)
    val ids = new OrderedDataset(spark, corpus).df
      .select("doc_id").as[Long].collect().sorted
    assert(ids.toSeq == ((0L until 20L) ++ (200L until 205L)).sorted)
  }

  test("in-stream boilerplate stripping rewrites at the door, replay-safe") {
    val dir = tmpDir("sdedup-seg")
    val corpus = s"$dir/corpus"; val index = s"$dir/index"
    val segIdx = s"$dir/segidx"
    val boiler = (0 until 10).map(i => s"b$i").mkString(" ")
    def doc(id: Long, tail: String) = (id, s"$boiler $tail")
    // batch 1: two docs sharing the boilerplate block → stripped from
    // BOTH (batch-internal df = 2), plus a clean doc
    val b1 = Seq(
      doc(1L, (0 until 10).map(i => s"a$i").mkString(" ")),
      doc(2L, (0 until 10).map(i => s"c$i").mkString(" ")),
      (3L, (0 until 10).map(i => s"solo$i").mkString(" ")))
      .toDF("doc_id", "text")
    assert(StreamingDedup.dedupBatch(spark, b1, "doc_id", "text",
      corpus, index, rowsPerFile = 8,
      segIndexDir = Some(segIdx), segIncrementTag = Some("b1")) == 3L)
    val stored = new OrderedDataset(spark, corpus).df
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(!stored(1L).contains("b0") && !stored(2L).contains("b0"))
    assert(stored(1L).startsWith("a0") && stored(3L).startsWith("solo0"))
    // batch 2: a NEW doc repeating the boilerplate — the index
    // remembers it (df ≥ 2 already), stripped without any batch peer
    val b2 = Seq(doc(10L, (0 until 10).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "text")
    assert(StreamingDedup.dedupBatch(spark, b2, "doc_id", "text",
      corpus, index, rowsPerFile = 8,
      segIndexDir = Some(segIdx), segIncrementTag = Some("b2")) == 1L)
    val s2 = new OrderedDataset(spark, corpus).df
      .filter($"doc_id" === 10L).select("text").as[String].head()
    assert(!s2.contains("b0") && s2.startsWith("z0"))
    // replaying batch 2 (crash between corpus commit and checkpoint):
    // no duplicate rows, no double-counted frequencies
    val before = new OrderedDataset(spark, segIdx).df
      .select("segd", "df").as[(String, Long)].collect().toMap
    assert(StreamingDedup.dedupBatch(spark, b2, "doc_id", "text",
      corpus, index, rowsPerFile = 8,
      segIndexDir = Some(segIdx), segIncrementTag = Some("b2")) == 0L)
    val after = new OrderedDataset(spark, segIdx).df
      .select("segd", "df").as[(String, Long)].collect().toMap
    assert(after == before)
    assert(new OrderedDataset(spark, corpus).df.count() == 4)
    // the replayed rewrite is bit-identical: the batch's own segments
    // (already in the index) are excluded from the replay verdict, so
    // doc 10's unique tail does NOT get self-stripped
    val s2b = new OrderedDataset(spark, corpus).df
      .filter($"doc_id" === 10L).select("text").as[String].head()
    assert(s2b == s2)
  }
}
