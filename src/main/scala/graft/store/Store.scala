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
    * Incremental growth is code, not prose: [[appendSharded]] routes
    * appends to the shard whose recorded range covers them
    * (chain-validated), [[reShard]] splits a key approaching the file
    * cap across fresh keys with the family chain preserved — each
    * step is ordinary per-dataset commits, so readers never see a
    * torn store.
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

  /** Parse a kv-recorded shard boundary back to a literal comparable
    * with the ordered COLUMN's type (the inverse of [[shardedWrite]]'s
    * toString stamp; both `LocalDateTime.toString` ISO and
    * `java.sql.Timestamp.toString` space-separated forms accepted for
    * the timestamp types).
    */
  private def boundLiteral(s: String,
      dt: org.apache.spark.sql.types.DataType): Any = {
    import org.apache.spark.sql.types._
    def ldt = try java.time.LocalDateTime.parse(s)
      catch { case _: java.time.format.DateTimeParseException =>
        java.sql.Timestamp.valueOf(s).toLocalDateTime }
    dt match {
      case LongType | IntegerType       => s.toLong
      case DoubleType | FloatType       => s.toDouble
      case TimestampNTZType             => ldt
      case TimestampType                =>
        try java.time.Instant.parse(s)
        catch { case _: java.time.format.DateTimeParseException =>
          // java.sql.Timestamp.toString renders the instant as JVM
          // default-zone wall time; valueOf(s).toInstant reverses it in
          // the SAME zone. (Reinterpreting via toLocalDateTime + UTC
          // would shift every bound by the zone offset on non-UTC JVMs
          // and route boundary-adjacent appends to the wrong shard.)
          java.sql.Timestamp.valueOf(s).toInstant }
      case other => throw new IllegalArgumentException(
        s"unsupported ordered_on type $other for shard bounds")
    }
  }

  /** The shard family `ks` as a VALIDATED chain: exactly one member
    * with an open lo, each `hiExcl` linking to exactly one member's
    * `lo`, ending at the one open `hiExcl`, visiting every key —
    * i.e. the recorded ranges tile the whole line and every ordered
    * value has exactly ONE covering shard. Pure string link-following
    * (no parsing), so it also works after [[reShard]] renumbers a
    * sub-family. Returns (key, lo, hiExcl) in range order.
    */
  private def shardChain(ks: Seq[K]): Seq[(K, String, String)] = {
    require(ks.nonEmpty, "no keys")
    val recs = ks.map { k =>
      val kv = get(k).meta.kv
      require(kv.contains("graft.shard.index"),
        s"$k carries no graft.shard.* kv — not a shardedWrite dataset")
      (k, kv.getOrElse("graft.shard.lo", ""),
        kv.getOrElse("graft.shard.hiExcl", ""))
    }
    val heads = recs.filter(_._2.isEmpty)
    require(heads.size == 1,
      s"shard family must have exactly one open-lo head, got " +
        s"${heads.map(_._1)} — pass the COMPLETE family")
    val byLo = recs.filter(_._2.nonEmpty).groupBy(_._2)
    byLo.collect { case (lo, rs) if rs.size > 1 =>
      throw new IllegalArgumentException(
        s"shard ranges overlap: ${rs.map(_._1)} all start at $lo")
    }: Unit
    val buf = scala.collection.mutable.ListBuffer.empty[(K, String, String)]
    var cur: Option[(K, String, String)] = Some(heads.head)
    while (cur.isDefined) {
      buf += cur.get
      require(buf.size <= recs.size,
        s"shard ranges form a cycle: ${buf.map(_._1)}")
      val hi = cur.get._3
      cur = if (hi.isEmpty) None else byLo.get(hi).map(_.head)
    }
    val chain = buf.toSeq
    require(chain.size == recs.size && chain.last._3.isEmpty,
      s"shard ranges do not chain: covered ${chain.map(_._1)} of " +
        s"${recs.map(_._1)} — a shard is missing or ranges are torn")
    chain
  }

  /** Route an APPEND batch across an existing shard family — the
    * incremental-growth step of the [[shardedWrite]] story as code:
    * each row lands in the shard whose kv-recorded `[lo, hiExcl)`
    * covers its ordered value (the open-ended first/last shards absorb
    * values below/above every recorded boundary, so growth at the
    * edges needs no re-ranging). `ks` must be the COMPLETE family —
    * the recorded ranges are chain-validated first ([[shardChain]]),
    * making "exactly one covering shard per row" a checked property,
    * not an assumption. Per-shard writes are ordinary ordered upserts
    * (overlap planning, dedup, file caps — all per-dataset invariants
    * unchanged) with the same null/type fail-fasts as
    * [[shardedWrite]], run inside [[transaction]] so a mid-family
    * failure rolls the committed shards back. A shard whose slice is
    * empty gets a metadata-only commit.
    */
  def appendSharded(df: DataFrame, opts: WriteOpts, ks: Seq[K]): Unit = {
    import org.apache.spark.sql.functions.{col, count, lit}
    val ordCol = opts.orderedOn
    OrderedDataset.typeTag(df.schema(ordCol).dataType): Unit
    val cnts = df.agg(count(lit(1)), count(col(ordCol))).head()
    require(cnts.getLong(1) == cnts.getLong(0),
      s"ordered_on '$ordCol' contains " +
        s"${cnts.getLong(0) - cnts.getLong(1)} null values; the " +
        "ordered store requires a total order — drop or fill them " +
        "first (shard routing would silently drop them)")
    val chain = shardChain(ks)
    val dt = df.schema(ordCol).dataType
    transaction(chain.map(_._1)) { dss =>
      chain.foreach { case (k, lo, hi) =>
        val pred = (Option(lo).filter(_.nonEmpty)
            .map(l => col(ordCol) >= lit(boundLiteral(l, dt))) ++
          Option(hi).filter(_.nonEmpty)
            .map(h => col(ordCol) < lit(boundLiteral(h, dt))))
          .reduceOption(_ && _).getOrElse(lit(true))
        dss(k).write(df.filter(pred), opts): Unit
      }
    }
  }

  /** Split ONE key's rows across fresh keys — the re-shard step of the
    * growth path, for a shard approaching
    * [[OrderedDataset.MaxFilesPerDataset]]: its rows are value-range
    * sharded to `keyOf` (atomically, via [[shardedWrite]]'s
    * transaction), the old shard's recorded OUTER bounds are
    * re-stamped on the first/last new shard so the family chain stays
    * intact ([[appendSharded]] keeps working across the renumbered
    * family), and the old key is deleted. Also works on a standalone
    * (never-sharded) dataset — open outer bounds — turning an over-cap
    * dataset into a fresh family in place.
    *
    * NOT atomic end-to-end, stated plainly: between the new shards'
    * commit and the delete, a reader unioning the whole family sees
    * the moved rows TWICE — quiesce family readers across the call. A
    * crash in that window leaves both; the remedy is deleting the old
    * key (`delete(k)`), which is also what a re-run must NOT shortcut
    * around (re-running shardedWrite into the same new keys would
    * upsert duplicates).
    */
  def reShard(k: K, opts: WriteOpts, keyOf: Int => K,
      targetRowsPerShard: Long): Seq[K] = {
    val old = get(k)
    require(old.exists, s"cannot re-shard $k: no dataset")
    val m = old.meta
    require(m.orderedOn == opts.orderedOn,
      s"ordered_on is fixed at creation: ${m.orderedOn} != " +
        opts.orderedOn)
    val oldLo = m.kv.getOrElse("graft.shard.lo", "")
    val oldHi = m.kv.getOrElse("graft.shard.hiExcl", "")
    val ks2 = shardedWrite(old.df, opts, keyOf, targetRowsPerShard)
    require(!ks2.contains(k),
      s"keyOf must not reuse the re-sharded key $k")
    if (oldLo.nonEmpty)
      get(ks2.head).updateKv(Map("graft.shard.lo" -> oldLo))
    if (oldHi.nonEmpty)
      get(ks2.last).updateKv(Map("graft.shard.hiExcl" -> oldHi))
    delete(k)
    ks2
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
