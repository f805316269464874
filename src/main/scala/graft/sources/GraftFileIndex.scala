package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types._
import graft.store.{DatasetMeta, FileStat, OrdDouble, OrdLong, OrdTs, OrdVal, Sidecar}

/** Catalyst [[FileIndex]] over an ordered dataset's `_graftmd.json`
  * zone-map sidecar: Spark's file-source planner calls `listFiles`
  * with the query's data filters, and files whose [min, max] stats
  * cannot satisfy the predicates on `ordered_on` are skipped WITHOUT
  * any parquet footer IO (the same driver-side planning as
  * `OrderedDataset.rangeDF`, ref iter_intersections.py:136-151 — but
  * driven by arbitrary user predicates, including ones written in
  * SQL against a `USING graft` view).
  *
  * Pruning is a pure optimization: Spark re-applies every data filter
  * at the scan (parquet row-group pushdown + post-scan Filter), so an
  * expression this index does not understand simply prunes nothing.
  *
  * 100 TB design: `listFiles` is O(#files) driver-side metadata work
  * over the already-loaded sidecar; the one `listStatus` RPC per
  * refresh is the same cost `spark.read.parquet(dir)` pays for its
  * InMemoryFileIndex, and the snapshot is immutable thereafter, so a
  * reader's plan cannot mix two store generations mid-query.
  */
final class GraftFileIndex private (spark: SparkSession, val dir: String,
    initial: Option[(DatasetMeta, Map[String, FileStatus])],
    restrict: Option[Set[String]],
    generation: Option[Long])
    extends FileIndex {

  def this(spark: SparkSession, dir: String) =
    this(spark, dir, None, None, None)

  /** Time-travel view: serve a RETAINED sidecar generation
    * ([[graft.store.OrderedDataset.dfAsOf]] semantics) — readable as
    * long as the replaced data files live out the reader grace window.
    */
  def this(spark: SparkSession, dir: String, generation: Long) =
    this(spark, dir, None, None, Some(generation))

  @volatile private var snapshot: (DatasetMeta, Map[String, FileStatus]) =
    initial.getOrElse(load())

  /** A view of this index serving ONLY the named files, sharing the
    * snapshot (no extra FS RPC). Used by [[GraftStatsAgg]] to scan just
    * the boundary files of a hybrid metadata+scan aggregate.
    */
  def restricted(names: Set[String]): GraftFileIndex =
    new GraftFileIndex(spark, dir, Some(snapshot), Some(names), generation)

  /** Files selected by the last `listFiles` call (test/diagnostic). */
  @volatile var lastSelectedFiles: Int = -1

  private def load(): (DatasetMeta, Map[String, FileStatus]) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val live0 = Sidecar.read(conf, dir)
    val m = generation match {
      case None => live0
      case Some(g) if g == live0.generation => live0
      case Some(g) =>
        val vp = new HPath(dir, Sidecar.versionedName(g))
        if (!vp.getFileSystem(conf).exists(vp))
          throw new IllegalArgumentException(
            s"generation $g of $dir is not retained (live is " +
              s"${live0.generation})")
        Sidecar.readPath(conf, vp)
    }
    val p = new HPath(dir)
    val fs = p.getFileSystem(conf)
    val live = m.files.map(_.name).toSet
    val statuses = fs.listStatus(p).iterator
      .filter(s => s.isFile && live.contains(s.getPath.getName))
      .map(s => s.getPath.getName -> s).toMap
    (m, statuses)
  }

  /** Sidecar meta, files filtered to the restriction (if any) — so the
    * stats-agg rule and `listFiles` agree on what this index serves.
    */
  def meta: DatasetMeta = {
    val m = snapshot._1
    restrict.fold(m)(r => m.copy(files = m.files.filter(f => r(f.name))))
  }

  /** Dataset schema served from the sidecar (no footer IO); falls back
    * to a parquet schema read only for pre-schema sidecars.
    */
  def dataSchema: StructType =
    if (meta.schemaJson.nonEmpty)
      org.apache.spark.sql.graftbridge.SparkInternals.asNullable(
        DataType.fromJson(meta.schemaJson).asInstanceOf[StructType])
    else if (meta.files.isEmpty)
      throw new IllegalArgumentException(
        s"graft dataset at $dir is empty and carries no schema")
    else spark.read.parquet(inputFiles.toIndexedSeq: _*).schema

  override def rootPaths: Seq[HPath] = Seq(new HPath(dir))

  override def partitionSchema: StructType = StructType(Nil)

  override def refresh(): Unit = snapshot = load()

  override def inputFiles: Array[String] =
    meta.files.map(f => s"$dir/${f.name}").toArray

  override def sizeInBytes: Long = {
    val st = snapshot._2
    meta.files.iterator.flatMap(f => st.get(f.name)).map(_.getLen).sum
  }

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val statuses = snapshot._2
    val sel = GraftFileIndex.selectFiles(meta, dataFilters)
    lastSelectedFiles = sel.size
    // a sidecar file absent from the directory snapshot must fail the
    // query, not silently shrink it (can only happen if a dataset's
    // retire-grace window elapsed under a long-lived index — refresh())
    val files = sel.map { f =>
      statuses.getOrElse(f.name, {
        val p = new HPath(s"$dir/${f.name}")
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .getFileStatus(p) // throws FileNotFoundException if gone
      })
    }
    Seq(PartitionDirectory(InternalRow.empty, files.toArray))
  }
}

object GraftFileIndex {

  /** Zone-map file selection: keep the files whose stats can satisfy
    * every conjunct's constraint — the ordered column prunes on the
    * exact [min, max] zone map, any other column on its secondary
    * `ColStat` (data skipping), where a missing side admits the file.
    * Conservative by construction: an expression with no derivable
    * constraint, a column with no stats, or a stat/literal type
    * mismatch keeps the file.
    */
  def selectFiles(m: DatasetMeta, dataFilters: Seq[Expression])
      : Seq[FileStat] = {
    val preds = dataFilters.flatMap(boundOf(_))
    def rangeOf(f: FileStat, col: String): (Option[OrdVal], Option[OrdVal]) =
      if (col.equalsIgnoreCase(m.orderedOn)) (Some(f.min), Some(f.max))
      else f.cols.collectFirst {
        case (n, st) if n.equalsIgnoreCase(col) => (st.min, st.max)
      }.getOrElse((None, None))
    m.files.filter { f =>
      preds.forall { p =>
        try p.admits(rangeOf(f, _))
        catch { case _: IllegalArgumentException => true } // type mismatch
      }
    }
  }

  /** A file-admissibility predicate derived from one filter conjunct;
    * `rangeOf` serves the file's (min, max) for a column name.
    */
  sealed private trait Bound {
    def admits(rangeOf: String => (Option[OrdVal], Option[OrdVal])): Boolean
  }
  private case class Ge(c: String, v: OrdVal) extends Bound {
    def admits(r: String => (Option[OrdVal], Option[OrdVal])) =
      r(c)._2.forall(_ >= v)
  }
  private case class Gt(c: String, v: OrdVal) extends Bound {
    def admits(r: String => (Option[OrdVal], Option[OrdVal])) =
      r(c)._2.forall(_ > v)
  }
  private case class Le(c: String, v: OrdVal) extends Bound {
    def admits(r: String => (Option[OrdVal], Option[OrdVal])) =
      r(c)._1.forall(_ <= v)
  }
  private case class Lt(c: String, v: OrdVal) extends Bound {
    def admits(r: String => (Option[OrdVal], Option[OrdVal])) =
      r(c)._1.forall(_ < v)
  }
  private case class Points(c: String, vs: Seq[OrdVal]) extends Bound {
    def admits(r: String => (Option[OrdVal], Option[OrdVal])) = {
      val (lo, hi) = r(c)
      vs.exists(v => lo.forall(_ <= v) && hi.forall(_ >= v))
    }
  }
  private case class OrB(l: Bound, r: Bound) extends Bound {
    def admits(rf: String => (Option[OrdVal], Option[OrdVal])) =
      l.admits(rf) || r.admits(rf)
  }
  private case class AndB(l: Bound, r: Bound) extends Bound {
    def admits(rf: String => (Option[OrdVal], Option[OrdVal])) =
      l.admits(rf) && r.admits(rf)
  }

  /** Internal (catalyst) literal value → sidecar stat value. Timestamp
    * literals are epoch/wall-clock microseconds for both LTZ and NTZ —
    * exactly what `OrdTs` stores; strings arrive as UTF8String.
    */
  private[sources] def ordVal(value: Any, dt: DataType): Option[OrdVal] =
    (value, dt) match {
      case (null, _)                      => None
      case (v: Long, LongType)            => Some(OrdLong(v))
      case (v: Int, IntegerType)          => Some(OrdLong(v.toLong))
      case (v: Short, ShortType)          => Some(OrdLong(v.toLong))
      case (v: Byte, ByteType)            => Some(OrdLong(v.toLong))
      case (v: Double, DoubleType)        => Some(OrdDouble(v))
      case (v: Float, FloatType)          => Some(OrdDouble(v.toDouble))
      case (v: Long, TimestampNTZType)    => Some(OrdTs(v))
      case (v: Long, TimestampType)       => Some(OrdTs(v))
      // default (binary) collation only — OrdStr compares in binary
      // UTF-8 order, which is what min/max under UTF8_BINARY used
      case (v: org.apache.spark.unsafe.types.UTF8String, st: StringType)
          if st == StringType =>
        Some(graft.store.OrdStr(v.toString))
      case _                              => None
    }

  private def boundOf(e: Expression): Option[Bound] = {
    def attr(a: Expression): Option[String] = a match {
      case ar: AttributeReference => Some(ar.name)
      case _                      => None
    }
    def lit(l: Expression): Option[OrdVal] = l match {
      case Literal(v, dt) => ordVal(v, dt)
      case _              => None
    }
    def mk(a: Expression, l: Expression, f: (String, OrdVal) => Bound)
        : Option[Bound] =
      for { c <- attr(a); v <- lit(l) } yield f(c, v)
    e match {
      case GreaterThan(a, l)        => mk(a, l, Gt).orElse(mk(l, a, Lt))
      case GreaterThanOrEqual(a, l) => mk(a, l, Ge).orElse(mk(l, a, Le))
      case LessThan(a, l)           => mk(a, l, Lt).orElse(mk(l, a, Gt))
      case LessThanOrEqual(a, l)    => mk(a, l, Le).orElse(mk(l, a, Ge))
      case EqualTo(a, l) =>
        mk(a, l, (c, v) => Points(c, Seq(v)))
          .orElse(mk(l, a, (c, v) => Points(c, Seq(v))))
      case EqualNullSafe(a, l) =>
        mk(a, l, (c, v) => Points(c, Seq(v)))
          .orElse(mk(l, a, (c, v) => Points(c, Seq(v))))
      case In(a, vs) =>
        attr(a).flatMap { c =>
          val pts = vs.map(lit)
          if (pts.nonEmpty && pts.forall(_.isDefined))
            Some(Points(c, pts.flatten))
          else None
        }
      case InSet(a, hset) =>
        attr(a).flatMap { c =>
          val dt = a.dataType
          val pts = hset.toSeq.map(v => ordVal(v, dt))
          if (pts.nonEmpty && pts.forall(_.isDefined))
            Some(Points(c, pts.flatten))
          else None
        }
      case And(l, r) =>
        (boundOf(l), boundOf(r)) match {
          case (Some(a), Some(b)) => Some(AndB(a, b))
          case (a, b)             => a.orElse(b)
        }
      case Or(l, r) =>
        // both sides must constrain stats, else the disjunction admits
        // everything
        for { a <- boundOf(l); b <- boundOf(r) } yield OrB(a, b)
      case _ => None
    }
  }
}
