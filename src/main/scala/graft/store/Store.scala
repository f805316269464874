package graft.store

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.immutable.TreeSet

/** One interval of a synchronized multi-dataset range scan: every slice
  * covers exactly [lo, hiExcl) of the shared ordered column
  * (ref iter_intersections.py:201-302).
  */
final case class Intersection[K](lo: OrdVal, hiExcl: Option[OrdVal],
                                 slices: Map[K, DataFrame])

/** Collection of ordered datasets under one basepath, keyed by a typed
  * indexer (ref oups/store/store/store.py:67-131). Key discovery scans
  * the directory tree at indexer depth for sidecar files
  * (ref store.py:22-64) and returns a sorted key set (ref store.py:50).
  */
final class Store[K](val spark: SparkSession, val basepath: String,
                     val indexer: Indexer[K])(implicit ord: Ordering[K]) {

  private def fs: FileSystem =
    new HPath(basepath).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def dirOf(k: K): String = s"$basepath/${indexer.toPath(k)}"

  def get(k: K): OrderedDataset = new OrderedDataset(spark, dirOf(k))

  def apply(k: K): OrderedDataset = get(k)

  /** Sorted set of keys whose directory holds a sidecar. */
  def keys: TreeSet[K] = {
    val base = new HPath(basepath)
    if (!fs.exists(base)) return TreeSet.empty[K]
    def walk(p: HPath, depth: Int): Seq[HPath] =
      if (depth == 0) Seq(p)
      else fs.listStatus(p).toSeq.filter(_.isDirectory)
        .flatMap(s => walk(s.getPath, depth - 1))
    val dirs = walk(base, indexer.depth)
    val baseUri = base.toUri.getPath.stripSuffix("/")
    TreeSet.from(dirs.flatMap { d =>
      val rel = d.toUri.getPath.stripPrefix(baseUri).stripPrefix("/")
      if (Sidecar.exists(spark.sparkContext.hadoopConfiguration,
        d.toUri.getPath)) indexer.fromPath(rel) else None
    })
  }

  /** Delete a dataset's files and prune now-empty parents
    * (ref store.py:230-257, base.py:405-438).
    */
  def delete(k: K): Unit = {
    fs.delete(new HPath(dirOf(k)), true)
    var p = new HPath(dirOf(k)).getParent
    val stop = new HPath(basepath)
    while (p != null && p.toString != stop.toString &&
        fs.exists(p) && fs.listStatus(p).isEmpty) {
      fs.delete(p, false)
      p = p.getParent
    }
  }

  /** All-or-nothing multi-dataset commit with compensating rollback —
    * beyond both the reference and single-table lakehouses: `body`
    * receives the datasets for `ks` and may write/delete/upsert any of
    * them; if it THROWS, every dataset is reverted to its
    * pre-transaction generation ([[OrderedDataset.restoreTo]] — a
    * metadata-only commit; datasets CREATED inside the failed body are
    * removed). The canonical use: the corpus + its dedup/contamination
    * indexes must advance together, or a half-applied ingest leaves
    * the indexes lying about the corpus.
    *
    * Contract (stated, not hidden): atomicity is COMPENSATING, not
    * isolated — concurrent readers can observe intermediate
    * generations while `body` runs (each inner commit is individually
    * atomic, so they never see a torn dataset); rollback depends on
    * the pre-transaction generations still being retained, so `body`
    * must complete within the retire grace window; a crash DURING
    * rollback leaves the remaining reverts to the caller (the
    * pre-transaction generation numbers are in the exception message).
    * Writers OUTSIDE the transaction must not touch the same keys
    * while it runs — a rollback reverts to the pre-transaction
    * generation wholesale and would undo the bystander's commit with
    * it (serialize independent writers with `lockWaitMs`, or route
    * all writes to a key set through its transactions).
    */
  def transaction(ks: Seq[K])(body: Map[K, OrderedDataset] => Unit)
      : Unit = {
    require(ks.nonEmpty, "no keys")
    val dss = ks.distinct.map(k => k -> get(k))
    val pre: Seq[(K, Option[Long])] = dss.map { case (k, d) =>
      k -> (if (d.exists) Some(d.meta.generation) else None)
    }
    try body(dss.toMap)
    catch {
      case e: Throwable =>
        val failures = pre.flatMap { case (k, g0) =>
          val d = get(k)
          try {
            g0 match {
              case Some(g) =>
                if (!d.exists)
                  // the body deleted a pre-existing dataset; nothing is
                  // left to restore FROM — silent success here would
                  // report a full revert that did not happen
                  Some(s"$k -> generation $g: dataset was removed by " +
                    "the transaction body, cannot restore")
                else {
                  if (d.meta.generation != g) d.restoreTo(g)
                  None
                }
              case None =>
                if (d.exists) d.removeFromDisk()
                None
            }
          } catch {
            case re: Throwable =>
              Some(s"$k -> generation ${g0.getOrElse("ABSENT")}: " +
                re.getMessage)
          }
        }
        if (failures.nonEmpty) throw new IllegalStateException(
          s"transaction rollback INCOMPLETE, revert manually: " +
            failures.mkString("; "), e)
        throw e
    }
  }

  /** The growth path past the per-dataset stats ceiling
    * ([[OrderedDataset.MaxFilesPerDataset]] × the default row-group
    * target caps ONE dataset at ≈ 19 TB): split a batch into
    * VALUE-RANGE shards of the ordered column and write each shard to
    * its own store key — the store-key sharding remedy as code, not
    * prose. Shard boundaries are the (i/nShards)-quantiles of
    * `opts.orderedOn` (Spark's `percentile_approx`, which accepts the
    * numeric AND timestamp ordered types), so shards hold DISJOINT
    * value ranges: every per-dataset invariant — sidecar zone maps,
    * ordered scans, upsert planning — holds unchanged per shard, and a
    * range query prunes whole KEYS before the per-file zone maps even
    * load (each shard records its range in kv:
    * `graft.shard.index/lo/hiExcl`). Read back with [[rangeDFAcross]]
    * (or [[intersectionsDF]] when the key tag is wanted).
    *
    * Scale notes, stated honestly: each shard's write filters the
    * input again — callers at data scale should persist (or
    * re-read from a source with pushdown) `df` so the nShards passes
    * prune instead of recompute; heavy value skew can collapse
    * adjacent quantiles, in which case FEWER, larger shards come back
    * (duplicate boundaries are coalesced — a single over-represented
    * value never splits across shards, keeping ranges disjoint).
    * Incremental growth: route APPENDS to the shard whose recorded
    * range covers them (`keys` + kv), and re-shard a key that
    * approaches the file cap by `shardedWrite`-ing ITS rows across
    * fresh keys — each step is ordinary per-dataset commits, so
    * readers never see a torn store.
    *
    * Contract guards, enforced BEFORE the first shard commits:
    * `orderedOn` must be a supported ordered type
    * ([[OrderedDataset.typeTag]] — the quantile split needs a totally
    * ordered numeric/timestamp column; strings are zone-map stat
    * values, not ordered_on values) and must be null-free — a shard
    * predicate `col >= lo` evaluates NULL and would silently drop
    * null-ordered rows into NO shard whenever nShards > 1, while the
    * single-shard path (`lit(true)`) defers to [[OrderedDataset.write]]
    * which rejects them loudly; same batch, error at small scale,
    * silent loss at large — so the null reject here mirrors write()'s.
    * The shard loop runs inside [[transaction]] over the (precomputed)
    * key list: a failure mid-loop rolls already-committed shards back
    * (created datasets removed, pre-existing keys restored), so a
    * caller never inherits an undocumented half-sharded corpus.
    */
  def shardedWrite(df: DataFrame, opts: WriteOpts, keyOf: Int => K,
      targetRowsPerShard: Long,
      quantileAccuracy: Int = 10000): Seq[K] = {
    import org.apache.spark.sql.functions.{array, col, count, lit,
      percentile_approx}
    require(targetRowsPerShard > 0,
      s"targetRowsPerShard must be positive, got $targetRowsPerShard")
    val ordCol = opts.orderedOn
    // fail fast with the store's own named error instead of letting
    // percentile_approx die in analysis naming neither limitation nor
    // remedy (string-typed ordered_on is legal nowhere in the store)
    OrderedDataset.typeTag(df.schema(ordCol).dataType): Unit
    // row count + non-null count in ONE action; reject nulls up front
    val cnts = df.agg(count(lit(1)), count(col(ordCol))).head()
    val n = cnts.getLong(0)
    require(cnts.getLong(1) == n,
      s"ordered_on '$ordCol' contains ${n - cnts.getLong(1)} null " +
        "values; the ordered store requires a total order — drop or " +
        "fill them first (sharding predicates would silently route " +
        "them to no shard)")
    val nShards =
      math.max(1L, math.ceil(n.toDouble / targetRowsPerShard).toLong).toInt
    val bounds: Seq[Any] =
      if (nShards == 1) Nil
      else {
        val probs = (1 until nShards).map(_.toDouble / nShards)
        df.select(percentile_approx(col(ordCol),
            array(probs.map(lit(_)): _*), lit(quantileAccuracy)).as("q"))
          .head().getSeq[Any](0).distinct
      }
    val ranges: Seq[(Option[Any], Option[Any])] =
      (None +: bounds.map(Option(_))).zip(bounds.map(Option(_)) :+ None)
    val ks = ranges.indices.map(keyOf)
    require(ks.distinct.size == ks.size,
      s"keyOf must be injective over shard indices 0..${ranges.size - 1}" +
        s", got duplicate keys in $ks")
    transaction(ks) { dss =>
      ranges.zipWithIndex.foreach { case ((lo, hi), i) =>
        val pred = (lo.map(l => col(ordCol) >= lit(l)) ++
          hi.map(h => col(ordCol) < lit(h)))
          .reduceOption(_ && _).getOrElse(lit(true))
        dss(ks(i)).write(df.filter(pred), opts.copy(kv = opts.kv ++ Map(
          "graft.shard.index" -> i.toString,
          "graft.shard.lo" -> lo.map(_.toString).getOrElse(""),
          "graft.shard.hiExcl" -> hi.map(_.toString).getOrElse("")))): Unit
      }
    }
    ks
  }

  /** Pruned union read across keys (the [[shardedWrite]] read-back):
    * one zone-map-pruned [[OrderedDataset.rangeDF]] per key, unioned.
    * A key whose files all miss the range contributes a zero-file
    * scan — driver-side sidecar metadata work only — so a point/range
    * query over a sharded corpus touches just the shard(s) covering
    * it.
    */
  def rangeDFAcross(ks: Seq[K], start: Option[OrdVal] = None,
      endExcl: Option[OrdVal] = None): DataFrame = {
    require(ks.nonEmpty, "no keys")
    ks.map(k => get(k).rangeDF(start, endExcl)).reduce(_ unionByName _)
  }

  /** Synchronized range scan across datasets sharing the ordered column
    * (ref store.py:303-326, iter_intersections.py:66-302). Boundaries
    * are the union of per-file min values from the sidecars — driver-side
    * metadata work; each yielded slice is a zone-map-pruned lazy
    * DataFrame, so only the row groups overlapping the interval are read
    * when a slice is consumed.
    */
  /** Set-oriented form of the synchronized range scan (SURVEY §2.5
    * option A): ONE zone-map-pruned read per key tagged with the key
    * name — the same rows the zipper yields, in a 2-branch plan instead
    * of #intervals × #keys branches. Use this when downstream processing
    * is relational; use iterIntersections when interval-at-a-time
    * iteration is required.
    */
  def intersectionsDF(ks: Seq[K], start: Option[OrdVal],
      endExcl: Option[OrdVal], keyName: K => String): DataFrame = {
    require(ks.nonEmpty, "no keys")
    ks.map { k =>
      get(k).rangeDF(start, endExcl)
        .withColumn("ds_key", org.apache.spark.sql.functions.lit(keyName(k)))
    }.reduce(_ unionByName _)
  }

  def iterIntersections(ks: Seq[K], start: Option[OrdVal] = None,
      endExcl: Option[OrdVal] = None): Iterator[Intersection[K]] = {
    require(ks.nonEmpty, "no keys")
    val dss = ks.map(k => k -> get(k))
    val metas = dss.map { case (k, d) => k -> d.meta }
    val names = metas.map(_._2.orderedOn).distinct
    require(names.size == 1,
      s"iterIntersections requires a shared ordered_on, got $names")

    val mins = metas.flatMap(_._2.files.map(_.min))
    if (mins.isEmpty) return Iterator.empty
    val globalLo = start.getOrElse(mins.min)
    val boundaries = (mins :+ globalLo)
      .filter(b => b >= globalLo && endExcl.forall(b < _))
      .distinct.sorted
    val his: Seq[Option[OrdVal]] =
      boundaries.drop(1).map(Some(_)) :+ endExcl
    boundaries.zip(his).iterator
      .filter { case (lo, hi) => hi.forall(h => lo < h) }
      .map { case (lo, hi) =>
        Intersection(lo, hi,
          dss.map { case (k, d) => k -> d.rangeDF(Some(lo), hi) }.toMap)
      }
  }
}
