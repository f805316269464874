package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.store.{NRows, OrdLong, OrderedDataset, WriteOpts}

/** Store-backed IVF index: the inverted lists persisted as an
  * OrderedDataset ORDERED ON the centroid id. Ordering by cid gives
  * list locality on disk, so the sidecar zone map turns "probe these
  * nProbe lists" into pruned range reads — unprobed lists are never
  * opened, without any footer IO. This is where the engine's two halves
  * meet: the ordered store is the ANN index format, and search cost is
  * (lists read ÷ total lists) of the corpus, the IVF contract.
  */
object IvfIndex {

  /** Assign every corpus vector to its nearest centroid and persist the
    * inverted lists ordered on cid. `corpus` is (id, vec, norm) — see
    * SimilarityOps.withNorm. Rebuild = call again (ordinary upsert).
    */
  def build(spark: SparkSession, dir: String, corpus: DataFrame,
      centroidFilter: Column, rowsPerFile: Long = 1000000L): Unit =
    buildWith(spark, dir, corpus, corpus.filter(centroidFilter),
      rowsPerFile)

  /** [[build]] against an EXPLICIT centroid table — the entry for a
    * TRAINED quantizer ([[SimilarityOps.kmeansTrain]] output) instead
    * of the deterministic id-subset seed. The caller keeps the
    * centroid table (persist it beside the index) — `add` and
    * `search` must use the same one.
    */
  def buildWith(spark: SparkSession, dir: String, corpus: DataFrame,
      centroids: DataFrame, rowsPerFile: Long = 1000000L): Unit = {
    val assigned = SimilarityOps.ivfAssignTo(corpus, centroids)
      .select(col("cid"), col("id"), col("vec"), col("norm"))
    new OrderedDataset(spark, dir)
      .write(assigned, WriteOpts("cid", NRows(rowsPerFile),
        kv = Map("graft.index.kind" -> "ivf")))
  }

  /** Incrementally add vectors to an existing index: assign the batch
    * against the SAME centroid table the index was built with (caller-
    * managed, exactly as in [[search]] — a filter over the batch alone
    * would fabricate a different centroid set). The batch lands as an
    * LSM delta segment ([[IndexSegments]], r12): a typical increment
    * touches EVERY list (vectors scatter across centroids), so the
    * r11 in-place upsert rewrote essentially the whole index per add;
    * the segment write costs the increment's sort alone, probes union
    * base + live segments, and [[DedupIndex.compactIndex]] folds
    * segments back periodically.
    */
  def add(spark: SparkSession, dir: String, newVecs: DataFrame,
      centroids: DataFrame, rowsPerFile: Long = 1000000L,
      maxSegments: Option[Int] = None): Unit = {
    val assigned = SimilarityOps.ivfAssignTo(newVecs, centroids)
      .select(col("cid"), col("id"), col("vec"), col("norm"))
    val base = new OrderedDataset(spark, dir)
    if (!base.exists)
      base.write(assigned, WriteOpts("cid", NRows(rowsPerFile),
        kv = Map("graft.index.kind" -> "ivf"))): Unit
    else IndexSegments.writeSegment(spark, dir, assigned,
      WriteOpts("cid", NRows(rowsPerFile),
        kv = Map("graft.index.kind" -> "ivf")))
    // opt-in read-amplification bound: fold once maxSegments are live
    // (one amortized O(index) fold per maxSegments O(increment) adds)
    maxSegments.foreach(ms =>
      DedupIndex.compactIndexIfNeeded(spark, dir, ms): Unit)
  }

  /** Probe the nProbe nearest lists per query against the stored index.
    * The probed cid set (≤ |queries| × nProbe, driver-bounded by the
    * query-batch contract) is collapsed into contiguous ranges and read
    * through the zone map; scoring/ranking then touches only those
    * lists.
    */
  def search(spark: SparkSession, dir: String, queries: DataFrame,
      centroids: DataFrame, nProbe: Int, k: Int): DataFrame = {
    val cents = broadcast(centroids.select(
      col("id").as("cid"), col("vec").as("cvec"), col("norm").as("cnorm")))
    val wp = Window.partitionBy("q_id")
      .orderBy(col("pcos").desc, col("cid"))
    // The probe table is driver-bounded (≤ |queries| × nProbe rows) by
    // the query-batch contract, so collect it once instead of persisting
    // a lazy frame that would be computed twice and whose cache would
    // outlive the call (ADVICE r2 leak): the collected rows feed both
    // the probed-cid planning and the broadcast side of the scoring join.
    val probePlan = queries.select(col("id").as("q_id"),
        col("vec").as("qvec"), col("norm").as("qnorm"))
      .join(cents)
      .withColumn("pcos", SimilarityOps.cosine(
        col("qvec"), col("cvec"), col("qnorm"), col("cnorm")))
      .withColumn("prank", row_number().over(wp))
      .filter(col("prank") <= nProbe)
      .select("q_id", "qvec", "qnorm", "cid")
    val probeRows = probePlan.collect()
    val probes = spark.createDataFrame(
      java.util.Arrays.asList(probeRows: _*), probePlan.schema)

    val probedCids = probeRows.map(_.getLong(3)).distinct.sorted
    // ONE scan branch per union member (base + live delta segments)
    // over the zone-map-selected files; the exact list membership is
    // an isin residual that parquet row-group stats prune
    val lists = probedLists(spark, dir, probedCids.toSeq)

    val wk = Window.partitionBy("q_id")
      .orderBy(col("cos").desc, col("vec_id"))
    lists.join(broadcast(probes), Seq("cid"))
      .filter(col("id") =!= col("q_id"))
      .select(col("q_id"), col("id").as("vec_id"),
        SimilarityOps.cosine(col("qvec"), col("vec"), col("qnorm"),
          col("norm")).as("cos"))
      .withColumn("rank", row_number().over(wk))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "vec_id", "cos")
  }

  /** The probed-lists read shared by [[search]]/[[searchPq]]: the
    * zone-map multi-point scan over base + live delta segments, from
    * one pinned capture. The isin residual pushes to parquet row-group
    * stats in every member. */
  private def probedLists(spark: SparkSession, dir: String,
      probedCids: Seq[Long]) = {
    val parts = IndexSegments.liveParts(spark, dir)
    require(parts.nonEmpty, s"no graft index at $dir")
    val pts = probedCids.map(OrdLong(_))
    // taken-down vector ids anti-joined per part (IndexSegments
    // tombstones — this path builds its own scans, so it applies them
    // explicitly where scanForProbes-based probes get them for free)
    IndexSegments.withTombstones(spark, parts,
        parts.map(p => p.ds.multiPointDFOf(p.m, pts)))
      .reduce(_ unionByName _)
      .filter(col("cid").isin(probedCids: _*))
  }

  /** Persist a PQ-COMPRESSED IVF index: `(cid, id, codes, rnorm)`
    * ordered on cid — M sub-codes per vector instead of the raw
    * floats (the raw vectors are not stored at all). At 100 TB this is
    * the difference between an index that fits in cluster page cache
    * and one that doesn't; `cb` is the [[SimilarityOps.pqCodebook]]
    * the caller manages alongside the centroid table.
    */
  def buildPq(spark: SparkSession, dir: String, corpus: DataFrame,
      centroidFilter: Column, cb: Array[Array[Array[Double]]],
      rowsPerFile: Long = 1000000L): Unit = {
    val encoded = SimilarityOps.pqEncode(
        SimilarityOps.ivfAssign(corpus, centroidFilter), cb)
      .select(col("cid"), col("id"), col("codes"), col("rnorm"))
    new OrderedDataset(spark, dir)
      .write(encoded, WriteOpts("cid", NRows(rowsPerFile),
        kv = Map("graft.index.kind" -> "ivfpq")))
  }

  /** ADC search over the stored code lists: probe planning and
    * zone-map-pruned range reads exactly as [[search]], but scoring is
    * the per-query lookup table against the persisted codes —
    * asymmetric distance, no vector payload read (none is stored).
    * Must be called with the same `centroids` and `cb` the index was
    * built with.
    */
  def searchPq(spark: SparkSession, dir: String, queries: DataFrame,
      centroids: DataFrame, cb: Array[Array[Array[Double]]],
      nProbe: Int, k: Int): DataFrame = {
    val m = cb.length
    val cents = broadcast(centroids.select(
      col("id").as("cid"), col("vec").as("cvec"), col("norm").as("cnorm")))
    val wp = Window.partitionBy("q_id")
      .orderBy(col("pcos").desc, col("cid"))
    // ltab[m][k] computed BEFORE the collect so the driver ships only
    // the (bounded) probe rows with their lookup tables, not raw qvecs
    val probePlan = queries.select(col("id").as("q_id"),
        col("vec").as("qvec"), col("norm").as("qnorm"))
      .join(cents)
      .withColumn("pcos", SimilarityOps.cosine(
        col("qvec"), col("cvec"), col("qnorm"), col("cnorm")))
      .withColumn("prank", row_number().over(wp))
      .filter(col("prank") <= nProbe)
      .select(col("q_id"), SimilarityOps.pqLookupTable(col("qvec"), cb)
        .as("ltab"), col("qnorm"), col("cid"))
    val probeRows = probePlan.collect()
    val probes = spark.createDataFrame(
      java.util.Arrays.asList(probeRows: _*), probePlan.schema)

    val probedCids = probeRows
      .map(r => r.getLong(r.fieldIndex("cid"))).distinct.sorted
    val lists = probedLists(spark, dir, probedCids.toSeq)

    val kw = cb(0).length
    val approx = (0 until m).map(mi =>
        element_at(col("ltab"),
          element_at(col("codes"), mi + 1) + lit(mi * kw) + 1)
          .cast("decimal(38,6)"))
      .reduce(_ + _).cast("double")
    val wk = Window.partitionBy("q_id")
      .orderBy(col("cos_pq").desc, col("vec_id"))
    lists.join(broadcast(probes), Seq("cid"))
      .filter(col("id") =!= col("q_id"))
      .select(col("q_id"), col("id").as("vec_id"),
        round(approx / (col("qnorm") * col("rnorm")), 6).as("cos_pq"))
      .withColumn("rank", row_number().over(wk))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "vec_id", "cos_pq")
  }
}
