package graft.pipeline

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.store.{DatasetMeta, OrdLong, OrderedDataset, Sidecar, WriteOpts}

/** LSM-style DELTA SEGMENTS for the store-backed index family
  * ([[Bm25Index]], [[DedupIndex]]): the write-path fix for the
  * uniform-hashed-key pathology (VERDICT r11 #1).
  *
  * The problem: every index in the family is an [[OrderedDataset]]
  * ordered on a uniformly distributed md5-prefix hkey. Probes are
  * genuinely O(increment) — zone maps route query keys to files — but
  * an increment's keys SPAN the whole keyspace, so the ordered
  * upsert's overlap planner marks essentially every file for rewrite:
  * add cost was O(index size) per increment, i.e. a daily crawl
  * increment rewrote the whole index daily.
  *
  * The fix is the standard LSM shape:
  *
  *  - the BASE run lives at `dir` (the first build — one sorted run,
  *    index kind/config kv, the replay-tag history);
  *  - each increment lands as its OWN fresh [[OrderedDataset]] under
  *    `dir/delta-<ms>-<rand>` — a brand-new dataset has no overlap to
  *    plan against, so the add's cost is sorting and writing the
  *    increment alone, and concurrent adds touch DISTINCT directories
  *    (no lock contention, no lost read-modify-write — the
  *    ADVICE-r11 buildSpanGrams lost-update window is gone
  *    structurally: count segments are summed at read time instead of
  *    merged at write time);
  *  - probes read the UNION of base + live segments: the probe keys
  *    are collected once and zone-map-routed per segment, so probe
  *    I/O stays ∝ increment × (1 + #live segments) — the standard
  *    LSM read amplification, bounded by compaction cadence;
  *  - [[compact]] periodically folds every live segment back into the
  *    base (one ordinary ordered upsert). The fold is declared IN the
  *    base commit's own sidecar swap (kv [[FoldedKey]]), so a crash
  *    can never leave segments both merged and still counted: readers
  *    exclude folded segments the moment the base commit is visible,
  *    atomically. Folded segment dirs are reaped after the reader
  *    grace window ([[vacuum]]).
  *
  * Consistent reads: [[liveParts]] captures the BASE sidecar first and
  * derives the folded set from that one snapshot; segment scans and
  * the base scan are all built from captured metadata
  * ([[OrderedDataset.dfOf]]), so a compaction committing mid-read
  * yields either the pre-fold view (old base files stay readable for
  * the grace window) or the post-fold view — never a double count.
  */
object IndexSegments {
  val DeltaPrefix = "delta-"

  /** Base kv: [[Sep]]-joined names of delta segment dirs whose rows a
    * compaction has already folded into the base. Committed in the
    * SAME sidecar swap as the folded data — the atomicity that makes
    * the fold crash-safe. */
  val FoldedKey = "graft.index.folded"

  /** kv stamp carried by a tagged increment (replay idempotence — the
    * foreachBatch epoch discipline; see [[DedupIndex.buildSegments]]). */
  val StampKey = "graft.index.increment"

  /** Base kv: [[Sep]]-joined increment tags already folded into the
    * base by compactions, newest last, bounded at [[MaxFoldedTags]].
    * Replay protection therefore covers every live segment plus the
    * last [[MaxFoldedTags]] folded increments — far past the
    * single-epoch retry a streaming sink needs. */
  val TagsKey = "graft.index.tags"
  val MaxFoldedTags = 64

  /** kv list separator — a control character no tag or dir name
    * contains. */
  val Sep = "\u001f"

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new HPath(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Fresh segment directory name: millis prefix keeps listing order ≈
    * creation order (debuggability only — correctness never depends on
    * it), the random suffix keeps concurrent adds collision-free. */
  def newSegmentDir(dir: String): String =
    s"$dir/$DeltaPrefix${System.currentTimeMillis()}-" +
      java.util.UUID.randomUUID().toString.take(8)

  /** One member of the index union: a dataset plus the CAPTURED
    * metadata every scan of it must be built from. */
  final case class Part(ds: OrderedDataset, m: DatasetMeta)

  private def splitList(s: String): Seq[String] =
    s.split(Sep).toSeq.filter(_.nonEmpty)

  private def foldedNames(baseKv: Map[String, String]): Set[String] =
    baseKv.get(FoldedKey).map(splitList(_).toSet).getOrElse(Set.empty)

  /** All COMMITTED delta segment dirs under `dir` (folded or not),
    * name-sorted. A dir without a committed sidecar (in-flight or
    * crashed add) is invisible. */
  private def allSegmentDirs(spark: SparkSession, dir: String)
      : Seq[String] = {
    val fsys = fs(spark, dir)
    val d = new HPath(dir)
    if (!fsys.exists(d)) Nil
    else fsys.listStatus(d).toSeq
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith(DeltaPrefix))
      .map(_.getPath.toUri.getPath)
      .filter(p => Sidecar.exists(spark.sparkContext.hadoopConfiguration, p))
      .sorted
  }

  /** The index union at a consistent cut: base (its sidecar captured
    * FIRST — the folded set comes from that one snapshot) followed by
    * the live (unfolded, committed) segments in creation order. Empty
    * when no base exists. */
  def liveParts(spark: SparkSession, dir: String): Seq[Part] = {
    val base = new OrderedDataset(spark, dir)
    if (!base.exists) return Nil
    val bm = base.meta // the ONE base capture everything below derives from
    val folded = foldedNames(bm.kv)
    val segs = allSegmentDirs(spark, dir)
      .filterNot(p => folded.contains(p.split('/').last))
      .map { p => val d = new OrderedDataset(spark, p); Part(d, d.meta) }
    Part(base, bm) +: segs
  }

  /** Total rows across the union — the corpus-size signal drift guards
    * read (e.g. [[DedupIndex.probeEmbedding]]'s occupancy check). */
  def totalRows(parts: Seq[Part]): Long = parts.map(_.m.totalRows).sum

  /** Full union scan over captured parts (the recount/repair path). */
  def unionDf(parts: Seq[Part]): DataFrame = {
    require(parts.nonEmpty, "no index parts")
    parts.map(p => p.ds.dfOf(p.m)).reduce(_ unionByName _)
  }

  /** The probe-cardinality dispatch over the union (the segmented form
    * of the old single-dataset scanForProbes): collect up to
    * `maxDriverKeys + 1` distinct probe keys in ONE job; under the
    * cap, zone-map-route the SAME key set through every part; over
    * it, stream the whole union into the caller's equi-join.
    * `dedupCols`, when non-empty and more than one part is live,
    * dedups rows that an (out-of-contract) re-add duplicated across
    * segments — presence probes keep their one-row-per-key contract;
    * the arbitrary survivor mirrors the old upsert's keep-last.
    */
  def scanForProbes(parts: Seq[Part], probeKeys: DataFrame,
      maxDriverKeys: Int, dedupCols: Seq[String] = Nil): DataFrame = {
    require(parts.nonEmpty, "no index parts")
    // null keys (e.g. md5 of a null text) can never match an index row
    val keys = probeKeys.na.drop().distinct()
      .limit(maxDriverKeys + 1).collect()
    val scans =
      if (keys.length <= maxDriverKeys) {
        val pts = keys.map(r => OrdLong(r.getLong(0))).toSeq.sortBy(_.v)
        parts.map(p => p.ds.multiPointDFOf(p.m, pts))
      } else {
        // loud, not silent: over the cap the probe streams the whole
        // index (I/O ∝ index, not increment). For the slim per-doc
        // indexes that is still a ~1000x win over re-hashing corpus
        // text; for gram-CARDINALITY-sized indexes (span grams) it is
        // the regime where recomputing can be cheaper — measured in
        // SCALE.md (r11f fixture-ratio row, r12 100:1-regime row).
        System.err.println(
          s"[graft] index probe of ${parts.head.ds.dir}: distinct probe" +
            s" keys exceed maxDriverKeys=$maxDriverKeys — falling back" +
            " to the full-index equi-join (cost ∝ index, not increment)")
        parts.map(p => p.ds.dfOf(p.m))
      }
    val u = scans.reduce(_ unionByName _)
    if (parts.size > 1 && dedupCols.nonEmpty) u.dropDuplicates(dedupCols)
    else u
  }

  /** True when `tag` was already applied: stamped on a live segment,
    * on the base itself (a tagged first build), or folded into the
    * base's tag history by a compaction. */
  def hasTag(spark: SparkSession, dir: String, tag: String): Boolean = {
    val parts = liveParts(spark, dir)
    parts.headOption.exists { base =>
      base.m.kv.get(StampKey).contains(tag) ||
        base.m.kv.get(TagsKey).exists(splitList(_).contains(tag)) ||
        parts.tail.exists(_.m.kv.get(StampKey).contains(tag))
    }
  }

  /** Land an increment as a fresh delta segment — cost ∝ increment
    * (sort + write of the batch alone; no overlap planning, no lock). */
  def writeSegment(spark: SparkSession, dir: String, rows: DataFrame,
      opts: WriteOpts): Unit =
    new OrderedDataset(spark, newSegmentDir(dir)).write(rows, opts): Unit

  /** Fold every live segment into the base — ONE ordinary ordered
    * upsert whose sidecar swap also commits the fold declaration
    * ([[FoldedKey]]) and the folded replay tags ([[TagsKey]]), so the
    * merge is atomic with its bookkeeping.
    *
    *  - presence indexes (`sumCols` empty): the segment union upserts
    *    into the base with `opts.duplicatesOn` — the base is read once
    *    (the upsert's own overlap pass);
    *  - count indexes (`sumCols` = the additive columns): base ∪
    *    segments is grouped on every other column and summed, and the
    *    totals supersede the base rows via keep-last dedup. Honest
    *    cost note: the base is read TWICE here — once in the grouped
    *    union and once by the upsert's own overlap pass — accepted
    *    because compaction is the amortized path (one fold per many
    *    O(increment) adds) and a single-read variant would need a
    *    bespoke full-replace commit outside the write path's
    *    invariants.
    *
    * Single-compactor discipline: compaction serializes on the base
    * write lock; a segment created DURING a compaction is simply not
    * in its captured list and stays live. Returns #segments folded.
    * Folded dirs stay on disk (readers holding pre-fold plans) until
    * [[vacuum]] reaps them past the grace window — compact() vacuums
    * opportunistically first.
    */
  def compact(spark: SparkSession, dir: String, opts: WriteOpts,
      sumCols: Seq[String] = Nil): Int = {
    vacuum(spark, dir): Unit
    val parts = liveParts(spark, dir)
    require(parts.nonEmpty, s"no graft index at $dir")
    val base = parts.head
    val segs = parts.tail
    if (segs.isEmpty) return 0
    val segNames = segs.map(_.ds.dir.split('/').last)
    // fold bookkeeping: names already folded but not yet vacuumed stay
    // listed (readers may still exclude them); folded tags append to
    // the bounded history, newest last
    val fsys = fs(spark, dir)
    val stillFolded = foldedNames(base.m.kv)
      .filter(n => fsys.exists(new HPath(s"$dir/$n")))
    val tags = (base.m.kv.get(TagsKey).map(splitList).getOrElse(Nil) ++
      base.m.kv.get(StampKey).toSeq ++
      segs.flatMap(_.m.kv.get(StampKey))).distinct.takeRight(MaxFoldedTags)
    val kvAdd = Map(FoldedKey -> (stillFolded.toSeq.sorted ++ segNames)
      .mkString(Sep)) ++
      (if (tags.nonEmpty) Map(TagsKey -> tags.mkString(Sep))
       else Map.empty[String, String])
    val segUnion = segs.map(p => p.ds.dfOf(p.m)).reduce(_ unionByName _)
    val batch =
      if (sumCols.isEmpty) segUnion
      else {
        val all = (base.ds.dfOf(base.m) +: segs.map(p => p.ds.dfOf(p.m)))
          .reduce(_ unionByName _)
        val keyCols = all.columns.filterNot(sumCols.contains).toSeq
        val aggs = sumCols.map(c => sum(col(c)).as(c))
        all.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
      }
    base.ds.write(batch, opts.copy(
      kv = opts.kv ++ kvAdd,
      // the base's own stamp (a tagged FIRST build) has moved into the
      // tag history above
      kvRemove = (opts.kvRemove :+ StampKey).distinct)): Unit
    // stamp the fold time on each folded dir (the retire() discipline):
    // vacuum's grace window counts from FOLDING, not from the segment's
    // last write — a reader holding a pre-fold plan gets the full window
    segs.foreach { p =>
      try fsys.setTimes(new HPath(p.ds.dir), System.currentTimeMillis(), -1)
      catch { case scala.util.control.NonFatal(_) => () }
    }
    segs.size
  }

  /** Reap folded segment dirs older than the reader grace window, plus
    * uncommitted (crashed-add) segment dirs past the same age. Returns
    * #dirs removed. */
  def vacuum(spark: SparkSession, dir: String,
      olderThanMs: Long = OrderedDataset.retireGraceMs): Int = {
    val base = new OrderedDataset(spark, dir)
    if (!base.exists) return 0
    val folded = foldedNames(base.kv)
    val fsys = fs(spark, dir)
    val d = new HPath(dir)
    if (!fsys.exists(d)) return 0
    val now = System.currentTimeMillis()
    val conf = spark.sparkContext.hadoopConfiguration
    fsys.listStatus(d).count { st =>
      val n = st.getPath.getName
      val reapable = st.isDirectory && n.startsWith(DeltaPrefix) &&
        (folded.contains(n) ||
          !Sidecar.exists(conf, st.getPath.toUri.getPath)) &&
        now - st.getModificationTime > olderThanMs
      if (reapable) { fsys.delete(st.getPath, true): Unit; true }
      else false
    }
  }
}
