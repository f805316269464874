package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LocalRelation, LogicalPlan, Project, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._
import graft.store.{DatasetMeta, FileStat, OrdDouble, OrdLong, OrdTs, OrdVal}

/** Metadata-answered aggregates over a graft dataset — two rewrites:
  *
  * '''Whole-relation''': `COUNT(*)` / `MIN` / `MAX` with no filter and
  * no grouping becomes a `LocalRelation` from the sidecar zone maps —
  * zero files opened (the lakehouse "metadata-only query"; the
  * reference keeps the same stats in its `_opdmd` sidecar, ref
  * base.py:58-62, but only its own planner reads them — here ANY Spark
  * SQL consumer gets the shortcut).
  *
  * '''Hybrid range aggregate''': `COUNT(*)` / `MIN` / `MAX` under a
  * WHERE whose every conjunct is a range/point predicate on the
  * ordered column becomes `covered ⊕ boundary`: files whose [min, max]
  * lie entirely inside the range contribute exactly from their sidecar
  * stats (every row of a covered file passes the filter, so its row
  * count AND its per-column min/max are exact contributions), and ONLY
  * the boundary files (at most a handful, however large the range) are
  * scanned, through a restricted [[GraftFileIndex]]; a final
  * one-row-per-side union combines them (Count→Sum, Min→Min, Max→Max).
  * "How many events last month, and the min/max value" on a 100 TB
  * store goes from a cluster job to a two-file read.
  *
  * Conservative by construction — any of these reverts to the
  * ordinary scan-based plan: DISTINCT, FILTER clauses, `COUNT(col)`
  * (non-null counts aren't tracked), grouping, expressions over the
  * aggregate, a conjunct not analyzable against the ordered column's
  * stats, min/max of string columns (stats are prefix-truncated) or of
  * any column missing a stat in some file. `IsNotNull(ordered_on)`
  * conjuncts are satisfied by the store's write-time invariant (null
  * ordered keys are rejected at write).
  */
object GraftStatsAgg extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg: Aggregate
        if agg.groupingExpressions.isEmpty &&
          agg.aggregateExpressions.nonEmpty =>
      rewriteWhole(agg).orElse(rewriteRangeCount(agg)).getOrElse(agg)
  }

  // ---------------- whole-relation COUNT/MIN/MAX ----------------

  private def rewriteWhole(agg: Aggregate): Option[LogicalPlan] =
    relationOf(agg.child).flatMap { case (_, _, g) =>
      val m = g.meta
      val vals = agg.aggregateExpressions.map(answer(_, m))
      if (vals.forall(_.isDefined))
        Some(LocalRelation(agg.output,
          Seq(InternalRow.fromSeq(vals.map(_.get.orNull)))))
      else None
    }

  /** Some(Some(v)) = answered with value v (None = SQL NULL);
    * None = not answerable from metadata.
    */
  private def answer(ne: NamedExpression, m: DatasetMeta)
      : Option[Option[Any]] = ne match {
    case Alias(ae: AggregateExpression, _) => answerAgg(ae, m)
    case ae: AggregateExpression           => answerAgg(ae, m)
    case _                                 => None
  }

  private def answerAgg(ae: AggregateExpression, m: DatasetMeta)
      : Option[Option[Any]] =
    if (ae.isDistinct || ae.filter.isDefined) None
    else ae.aggregateFunction match {
      case Count(Seq(Literal(v, _))) if v != null =>
        Some(Some(m.totalRows))
      case Min(a: AttributeReference) => extreme(m, a, isMin = true)
      case Max(a: AttributeReference) => extreme(m, a, isMin = false)
      case _                          => None
    }

  private def extreme(m: DatasetMeta, a: AttributeReference, isMin: Boolean)
      : Option[Option[Any]] =
    if (m.files.isEmpty) Some(None) // MIN/MAX over zero rows is NULL
    else statExtreme(m.files, a, isMin, m.orderedOn).map(Some(_))

  /** Exact stats-derived MIN/MAX over a file set: full-value zone map
    * for the ordered column, secondary `ColStat` otherwise. None =
    * not derivable (a file missing the stat, or a type — strings —
    * the stats can't reproduce exactly). Shared by the whole-relation
    * and hybrid-range paths so their answerability rules cannot drift.
    */
  private def statExtreme(files: Seq[FileStat], a: AttributeReference,
      isMin: Boolean, orderedOn: String): Option[Any] =
    if (a.name.equalsIgnoreCase(orderedOn)) {
      val v = files.map(f => if (isMin) f.min else f.max)
        .reduce((x, y) => if ((x < y) == isMin) x else y)
      internal(v, a.dataType)
    } else {
      val sides = files.map(_.cols.collectFirst {
        case (n, st) if n.equalsIgnoreCase(a.name) =>
          if (isMin) st.min else st.max
      }.flatten)
      if (sides.exists(_.isEmpty)) None
      else internal(
        sides.flatten.reduce((x, y) => if ((x < y) == isMin) x else y),
        a.dataType)
    }

  /** Sidecar stat value → Catalyst internal value of the column's type.
    * None (bail) on any type the stats can't reproduce exactly —
    * notably strings, whose stats are prefix-truncated.
    */
  private def internal(v: OrdVal, dt: DataType): Option[Any] = (v, dt) match {
    case (OrdLong(x), LongType)      => Some(x)
    case (OrdLong(x), IntegerType)   => Some(x.toInt)
    case (OrdLong(x), ShortType)     => Some(x.toShort)
    case (OrdLong(x), ByteType)      => Some(x.toByte)
    case (OrdDouble(x), DoubleType)  => Some(x)
    case (OrdDouble(x), FloatType)   => Some(x.toFloat)
    // OrdTs stores microseconds in the column's own frame (epoch for
    // LTZ, wall-clock for NTZ) — exactly Spark's internal encoding
    case (OrdTs(x), TimestampNTZType) => Some(x)
    case (OrdTs(x), TimestampType)    => Some(x)
    case _                            => None
  }

  // ---------------- hybrid range count ----------------

  /** Per-file truth of one conjunct: every row satisfies it (Full), no
    * row does (Fail), or the file straddles the predicate (Part).
    */
  private sealed trait Tri
  private case object Full extends Tri
  private case object Fail extends Tri
  private case object Part extends Tri

  /** What one aggregate expression computes, for the hybrid rewrite. */
  private sealed trait RKind
  private case object KCount extends RKind
  private final case class KExtreme(a: AttributeReference, isMin: Boolean)
      extends RKind

  private def kindOf(ne: NamedExpression): Option[RKind] = ne match {
    case Alias(ae: AggregateExpression, _)
        if !ae.isDistinct && ae.filter.isEmpty =>
      ae.aggregateFunction match {
        case Count(Seq(Literal(v, _))) if v != null => Some(KCount)
        case Min(a: AttributeReference) => Some(KExtreme(a, isMin = true))
        case Max(a: AttributeReference) => Some(KExtreme(a, isMin = false))
        case _                          => None
      }
    case _ => None
  }

  /** The covered-files contribution of one aggregate — exact because
    * every row of a covered file passes the filter. Some(null) = no
    * covered rows; None = not derivable (bail).
    */
  private def coveredValue(kind: RKind, covered: Seq[FileStat],
      m: DatasetMeta): Option[Any] = kind match {
    case KCount => Some(covered.map(_.rows).sum)
    case KExtreme(a, isMin) =>
      if (covered.isEmpty) Some(null)
      else statExtreme(covered, a, isMin, m.orderedOn)
  }

  private def rewriteRangeCount(agg: Aggregate): Option[LogicalPlan] = {
    val kinds = agg.aggregateExpressions.map(kindOf)
    if (kinds.exists(_.isEmpty)) None
    else filterOverRelation(agg.child).flatMap { case (cond, lr, h, g) =>
      val m = g.meta
      val tris = splitConjunctivePredicates(cond).map(triOf(_, m))
      if (tris.exists(_.isEmpty) || m.files.isEmpty) None
      else {
        val fns = tris.flatten
        def classify(f: FileStat): Tri = {
          val ts = fns.map(_(f))
          if (ts.contains(Fail)) Fail
          else if (ts.forall(_ == Full)) Full
          else Part
        }
        val classes = m.files.map(f => f -> classify(f))
        val covered = classes.collect { case (f, Full) => f }
        val partial = classes.collect { case (f, Part) => f }
        val cvals = kinds.map(k => coveredValue(k.get, covered, m))
        if (cvals.exists(_.isEmpty)) None
        else if (partial.isEmpty)
          // pure metadata: no boundary files at all
          Some(LocalRelation(agg.output,
            Seq(InternalRow.fromSeq(cvals.map(_.get)))))
        else if (covered.isEmpty)
          None // nothing saved — keep the ordinary pruned scan
        else {
          // covered from the sidecar + a scan of ONLY boundary files:
          // a union of the covered row and the boundary sub-aggregate,
          // combined per kind (Count→Sum, Min→Min, Max→Max)
          val sub = g.restricted(partial.map(_.name).toSet)
          val newRel = h.copy(location = sub)(h.sparkSession)
          val lr2 = lr.copy(relation = newRel)
          val subAggs = kinds.zipWithIndex.map { case (k, i) =>
            val fn = k.get match {
              case KCount          => Count(Seq(Literal(1)))
              case KExtreme(a, true)  => Min(a)
              case KExtreme(a, false) => Max(a)
            }
            Alias(AggregateExpression(fn, Complete, isDistinct = false),
              s"__graft_b$i")()
          }
          val subAgg = Aggregate(Nil, subAggs, Filter(cond, lr2))
          val localAttrs = kinds.zipWithIndex.map { case (k, i) =>
            k.get match {
              case KCount => AttributeReference(s"__graft_c$i", LongType,
                nullable = false)()
              case KExtreme(a, _) => AttributeReference(s"__graft_c$i",
                a.dataType, nullable = true)()
            }
          }
          val local = LocalRelation(localAttrs,
            Seq(InternalRow.fromSeq(cvals.map(_.get))))
          val union = Union(local :: subAgg :: Nil)
          val combined = agg.aggregateExpressions.zip(kinds)
            .zip(union.output).map { case ((ne, k), part) =>
              val a = ne.asInstanceOf[Alias]
              val fn = k.get match {
                // the union always has the covered row, so the sum is
                // never null — keep count's non-null output contract
                case KCount => KnownNotNull(AggregateExpression(
                  Sum(part), Complete, isDistinct = false))
                case KExtreme(_, true) => AggregateExpression(
                  Min(part), Complete, isDistinct = false)
                case KExtreme(_, false) => AggregateExpression(
                  Max(part), Complete, isDistinct = false)
              }
              Alias(fn, a.name)(exprId = a.exprId, qualifier = a.qualifier)
            }
          Some(Aggregate(Nil, combined, union))
        }
      }
    }
  }

  /** File-classification function for one conjunct, if it is a range /
    * point / IsNotNull predicate on the ordered column with a literal.
    */
  private def triOf(e: Expression, m: DatasetMeta)
      : Option[FileStat => Tri] = {
    def isOrd(a: Expression): Boolean = a match {
      case ar: AttributeReference => ar.name.equalsIgnoreCase(m.orderedOn)
      case _                      => false
    }
    def v(l: Expression): Option[OrdVal] = l match {
      case Literal(x, dt) => GraftFileIndex.ordVal(x, dt)
      case _              => None
    }
    def cmp(x: OrdVal)(full: FileStat => Boolean, fail: FileStat => Boolean)
        : FileStat => Tri =
      f => if (fail(f)) Fail else if (full(f)) Full else Part
    def eq(x: OrdVal): FileStat => Tri =
      cmp(x)(f => f.min == x && f.max == x, f => x < f.min || x > f.max)
    e match {
      // ordered_on is never null (rejected at write), so the analyzer's
      // implied IsNotNull holds for every row of every file
      case IsNotNull(a) if isOrd(a) => Some(_ => Full)
      case GreaterThanOrEqual(a, l) if isOrd(a) =>
        v(l).map(x => cmp(x)(_.min >= x, _.max < x))
      case GreaterThan(a, l) if isOrd(a) =>
        v(l).map(x => cmp(x)(_.min > x, _.max <= x))
      case LessThan(a, l) if isOrd(a) =>
        v(l).map(x => cmp(x)(_.max < x, _.min >= x))
      case LessThanOrEqual(a, l) if isOrd(a) =>
        v(l).map(x => cmp(x)(_.max <= x, _.min > x))
      // literal on the left: mirror the comparison
      case GreaterThanOrEqual(l, a) if isOrd(a) =>
        v(l).map(x => cmp(x)(_.max <= x, _.min > x))
      case GreaterThan(l, a) if isOrd(a) =>
        v(l).map(x => cmp(x)(_.max < x, _.min >= x))
      case LessThan(l, a) if isOrd(a) =>
        v(l).map(x => cmp(x)(_.min > x, _.max <= x))
      case LessThanOrEqual(l, a) if isOrd(a) =>
        v(l).map(x => cmp(x)(_.min >= x, _.max < x))
      case EqualTo(a, l) if isOrd(a)       => v(l).map(eq)
      case EqualTo(l, a) if isOrd(a)       => v(l).map(eq)
      case EqualNullSafe(a, l) if isOrd(a) => v(l).map(eq)
      case EqualNullSafe(l, a) if isOrd(a) => v(l).map(eq)
      case _                               => None
    }
  }

  // ---------------- plan-shape helpers ----------------

  private def attrsOnly(p: Project): Boolean =
    p.projectList.forall(_.isInstanceOf[AttributeReference])

  private def relationOf(plan: LogicalPlan)
      : Option[(LogicalRelation, HadoopFsRelation, GraftFileIndex)] =
    plan match {
      case lr: LogicalRelation => lr.relation match {
        case h: HadoopFsRelation => h.location match {
          case g: GraftFileIndex => Some((lr, h, g))
          case _                 => None
        }
        case _ => None
      }
      case p: Project if attrsOnly(p) => relationOf(p.child)
      case _                          => None
    }

  private def filterOverRelation(plan: LogicalPlan)
      : Option[(Expression, LogicalRelation, HadoopFsRelation,
        GraftFileIndex)] =
    plan match {
      case p: Project if attrsOnly(p) => filterOverRelation(p.child)
      case f: Filter =>
        relationOf(f.child).map { case (lr, h, g) => (f.condition, lr, h, g) }
      case _ => None
    }

  /** Idempotent runtime registration on a live session (the
    * `spark.sql.extensions` config path is
    * [[graft.functions.GraftExtensions]]).
    */
  def register(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(GraftStatsAgg))
      spark.experimental.extraOptimizations = cur :+ GraftStatsAgg
  }
}
