package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.store.{NRows, OrderedDataset, WriteOpts}

/** Store-backed BM25 postings index for INCREMENTAL lexical retrieval
  * — the sparse sibling of [[IvfIndex]], same layout discipline as
  * [[DedupIndex]]: one `(hkey, term, id, tf, dl)` row per distinct
  * (document, term), an `OrderedDataset` ORDERED ON the term's md5
  * leading 60 bits. Query terms hash to points, so a search is a
  * driver-planned multi-point read that opens ONLY the postings files
  * whose zone map covers a queried term — I/O ∝ Σ df(query term),
  * independent of corpus size — and a daily crawl increment extends
  * the index by tokenizing the increment alone.
  *
  * Corpus scalars (N, Σdl — the BM25 normalizers) live in the sidecar
  * kv. [[add]] bumps them with [[OrderedDataset.transformKv]] (a
  * locked read-modify-write, so concurrent adds compose); a crash
  * BETWEEN an add's data commit and its kv bump leaves the scalars
  * understated — detectable and repairable with [[recountStats]],
  * and harmless to ranking monotonicity (every score shares the same
  * normalizers).
  *
  * Scoring replays [[RetrievalOps.scoreTermTable]] on the pruned
  * read: document frequencies are counted from the very rows the
  * probe fetched (they are exactly that term's postings), so indexed
  * results are IDENTICAL to the brute [[RetrievalOps.bm25TopK]] over
  * the same corpus — the oracle-equality the driver checks.
  */
object Bm25Index {
  val Kind = "bm25"
  private val NDocsKey = "graft.bm25.n_docs"
  private val SumDlKey = "graft.bm25.sum_dl"

  private def scalars(tf: DataFrame): (Long, Long) = {
    val r = tf.groupBy("id").agg(max("dl").as("dl"))
      .agg(count(lit(1)).cast("long"), sum("dl").cast("long"))
      .collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  /** Build (or rebuild onto) the index at `dir` from a corpus. */
  def build(spark: SparkSession, dir: String, corpus: DataFrame,
      idCol: String, textCol: String, rowsPerFile: Long = 1000000L)
      : Unit = {
    val tf = RetrievalOps.termFreqs(corpus, idCol, textCol).persist()
    try {
      val (n, s) = scalars(tf)
      new OrderedDataset(spark, dir).write(
        tf.select(DedupIndex.hkey60(md5(col("term"))).as("hkey"),
          col("term"), col("id"), col("tf"), col("dl")),
        WriteOpts("hkey", NRows(rowsPerFile),
          duplicatesOn = Some(Seq("term", "id")),
          kv = Map("graft.index.kind" -> Kind,
            NDocsKey -> n.toString, SumDlKey -> s.toString))): Unit
    } finally tf.unpersist(): Unit
  }

  /** Extend the index with an increment: tokenize ONLY the batch,
    * upsert its postings (term-sorted interleave is the ordered
    * upsert's job), bump the corpus scalars under the lock. Re-adding
    * an id double-counts it — dedup increments upstream, like every
    * [[DedupIndex]] ingest does.
    *
    * The data write is OPTIMISTIC ([[OrderedDataset.writeOptimistic]])
    * because index maintenance is the uncoordinated-appenders case:
    * the default locked write fails fast on a held lock, so two
    * concurrent adds would lose one whole increment (Bm25IndexSpec
    * pins the compose case); optimistic writers overlap their prepare
    * and queue only at the ms-scale commit gate. The scalar bump is a
    * separate locked RMW — concurrent bumps compose by construction.
    */
  def add(spark: SparkSession, dir: String, batch: DataFrame,
      idCol: String, textCol: String, rowsPerFile: Long = 1000000L)
      : Unit = {
    val ds = new OrderedDataset(spark, dir)
    DedupIndex.requireCfg(ds, Kind, None)
    val tf = RetrievalOps.termFreqs(batch, idCol, textCol).persist()
    try {
      val (n, s) = scalars(tf)
      ds.writeOptimistic(
        tf.select(DedupIndex.hkey60(md5(col("term"))).as("hkey"),
          col("term"), col("id"), col("tf"), col("dl")),
        WriteOpts("hkey", NRows(rowsPerFile),
          duplicatesOn = Some(Seq("term", "id")))): Unit
      ds.transformKv { kv =>
        kv + (NDocsKey -> (kv(NDocsKey).toLong + n).toString) +
          (SumDlKey -> (kv(SumDlKey).toLong + s).toString)
      }
    } finally tf.unpersist(): Unit
  }

  /** Recompute the kv scalars from the postings themselves (one full
    * index scan — the repair path for a crash between an add's data
    * commit and its kv bump). */
  def recountStats(spark: SparkSession, dir: String): (Long, Long) = {
    val ds = new OrderedDataset(spark, dir)
    DedupIndex.requireCfg(ds, Kind, None)
    val r = ds.df.groupBy("id").agg(max("dl").as("dl"))
      .agg(count(lit(1)).cast("long"), sum("dl").cast("long"))
      .collect()(0)
    val (n, s) = (r.getLong(0), r.getLong(1))
    ds.updateKv(Map(NDocsKey -> n.toString, SumDlKey -> s.toString))
    (n, s)
  }

  /** Top-k BM25 through the index: hash the query vocabulary to
    * points, zone-map-prune the postings read, score identically to
    * the brute path. `maxDriverKeys` bounds the driver collect the
    * same way [[DedupIndex]] probes do (a query set is tiny by
    * construction; the guard is for misuse).
    */
  def topK(spark: SparkSession, dir: String, queries: DataFrame, k: Int,
      k1: Double = RetrievalOps.K1, b: Double = RetrievalOps.B,
      maxDriverKeys: Int = 65536): DataFrame = {
    val ds = new OrderedDataset(spark, dir)
    DedupIndex.requireCfg(ds, Kind, None)
    val kv = ds.kv
    // name the remedy, don't NoSuchElement: scalars can be absent
    // after a crash between an add's data commit and its kv bump
    require(kv.contains(NDocsKey) && kv.contains(SumDlKey),
      s"index at $dir lacks the BM25 corpus scalars " +
        s"($NDocsKey/$SumDlKey) — repair with " +
        s"Bm25Index.recountStats(spark, \"$dir\") or rebuild with " +
        "Bm25Index.build")
    val qterms = queries
      .select(explode(array_distinct(split(col("q_text"), " ")))
        .as("term"))
      .select(DedupIndex.hkey60(md5(col("term"))).as("hkey"))
    val pruned = DedupIndex.scanForProbes(spark, ds, qterms, maxDriverKeys)
      .select("id", "term", "tf", "dl")
    val stats = queries.sparkSession.range(1).select(
      lit(kv(NDocsKey).toLong).as("n_docs"),
      lit(kv(SumDlKey).toLong).as("sum_dl"))
    RetrievalOps.scoreTermTable(pruned, stats, queries, k, k1, b)
  }
}
