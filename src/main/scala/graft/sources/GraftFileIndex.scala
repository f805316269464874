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
final class GraftFileIndex(spark: SparkSession, val dir: String)
    extends FileIndex {

  @volatile private var snapshot: (DatasetMeta, Map[String, FileStatus]) =
    load()

  /** Files selected by the last `listFiles` call (test/diagnostic). */
  @volatile var lastSelectedFiles: Int = -1

  private def load(): (DatasetMeta, Map[String, FileStatus]) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val m = Sidecar.read(conf, dir)
    val p = new HPath(dir)
    val fs = p.getFileSystem(conf)
    val live = m.files.map(_.name).toSet
    val statuses = fs.listStatus(p).iterator
      .filter(s => s.isFile && live.contains(s.getPath.getName))
      .map(s => s.getPath.getName -> s).toMap
    (m, statuses)
  }

  def meta: DatasetMeta = snapshot._1

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
    snapshot._1.files.map(f => s"$dir/${f.name}").toArray

  override def sizeInBytes: Long = {
    val (m, st) = snapshot
    m.files.iterator.flatMap(f => st.get(f.name)).map(_.getLen).sum
  }

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val (m, statuses) = snapshot
    val sel = GraftFileIndex.selectFiles(m, dataFilters)
    lastSelectedFiles = sel.size
    val files = sel.flatMap(f => statuses.get(f.name))
    Seq(PartitionDirectory(InternalRow.empty, files.toArray))
  }
}

object GraftFileIndex {

  /** Zone-map file selection: keep the files whose [min, max] stats can
    * satisfy every conjunct's constraint on the ordered column.
    * Conservative by construction — an expression with no derivable
    * constraint keeps all files.
    */
  def selectFiles(m: DatasetMeta, dataFilters: Seq[Expression])
      : Seq[FileStat] = {
    val preds = dataFilters.flatMap(boundOf(m.orderedOn, _))
    m.files.filter(f => preds.forall(_.admits(f)))
  }

  /** A file-admissibility predicate derived from one filter conjunct. */
  sealed private trait Bound { def admits(f: FileStat): Boolean }
  private case class Ge(v: OrdVal) extends Bound {
    def admits(f: FileStat) = f.max >= v
  }
  private case class Gt(v: OrdVal) extends Bound {
    def admits(f: FileStat) = f.max > v
  }
  private case class Le(v: OrdVal) extends Bound {
    def admits(f: FileStat) = f.min <= v
  }
  private case class Lt(v: OrdVal) extends Bound {
    def admits(f: FileStat) = f.min < v
  }
  private case class Points(vs: Seq[OrdVal]) extends Bound {
    def admits(f: FileStat) = vs.exists(v => f.min <= v && v <= f.max)
  }
  private case class OrB(l: Bound, r: Bound) extends Bound {
    def admits(f: FileStat) = l.admits(f) || r.admits(f)
  }
  private case class AndB(l: Bound, r: Bound) extends Bound {
    def admits(f: FileStat) = l.admits(f) && r.admits(f)
  }

  /** Internal (catalyst) literal value → sidecar stat value. Timestamp
    * literals are epoch/wall-clock microseconds for both LTZ and NTZ —
    * exactly what `OrdTs` stores.
    */
  private def ordVal(value: Any, dt: DataType): Option[OrdVal] =
    (value, dt) match {
      case (null, _)                      => None
      case (v: Long, LongType)            => Some(OrdLong(v))
      case (v: Int, IntegerType)          => Some(OrdLong(v.toLong))
      case (v: Short, ShortType)          => Some(OrdLong(v.toLong))
      case (v: Byte, ByteType)            => Some(OrdLong(v.toLong))
      case (v: Double, DoubleType)        => Some(OrdDouble(v))
      case (v: Long, TimestampNTZType)    => Some(OrdTs(v))
      case (v: Long, TimestampType)       => Some(OrdTs(v))
      case _                              => None
    }

  private def boundOf(ordCol: String, e: Expression): Option[Bound] = {
    def isOrd(a: Expression): Boolean = a match {
      case ar: AttributeReference => ar.name.equalsIgnoreCase(ordCol)
      case _                      => false
    }
    def lit(l: Expression): Option[OrdVal] = l match {
      case Literal(v, dt) => ordVal(v, dt)
      case _              => None
    }
    e match {
      case GreaterThan(a, l) if isOrd(a)        => lit(l).map(Gt)
      case GreaterThan(l, a) if isOrd(a)        => lit(l).map(Lt)
      case GreaterThanOrEqual(a, l) if isOrd(a) => lit(l).map(Ge)
      case GreaterThanOrEqual(l, a) if isOrd(a) => lit(l).map(Le)
      case LessThan(a, l) if isOrd(a)           => lit(l).map(Lt)
      case LessThan(l, a) if isOrd(a)           => lit(l).map(Gt)
      case LessThanOrEqual(a, l) if isOrd(a)    => lit(l).map(Le)
      case LessThanOrEqual(l, a) if isOrd(a)    => lit(l).map(Ge)
      case EqualTo(a, l) if isOrd(a)            => lit(l).map(v => Points(Seq(v)))
      case EqualTo(l, a) if isOrd(a)            => lit(l).map(v => Points(Seq(v)))
      case EqualNullSafe(a, l) if isOrd(a)      => lit(l).map(v => Points(Seq(v)))
      case EqualNullSafe(l, a) if isOrd(a)      => lit(l).map(v => Points(Seq(v)))
      case In(a, vs) if isOrd(a) =>
        val pts = vs.map(lit)
        if (pts.nonEmpty && pts.forall(_.isDefined)) Some(Points(pts.flatten))
        else None
      case InSet(a, hset) if isOrd(a) =>
        val dt = a.dataType
        val pts = hset.toSeq.map(v => ordVal(v, dt))
        if (pts.nonEmpty && pts.forall(_.isDefined)) Some(Points(pts.flatten))
        else None
      case And(l, r) =>
        (boundOf(ordCol, l), boundOf(ordCol, r)) match {
          case (Some(a), Some(b)) => Some(AndB(a, b))
          case (a, b)             => a.orElse(b)
        }
      case Or(l, r) =>
        // both sides must constrain the column, else the disjunction
        // admits everything
        for { a <- boundOf(ordCol, l); b <- boundOf(ordCol, r) }
          yield OrB(a, b)
      case _ => None
    }
  }
}
