package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._
import graft.store.{DatasetMeta, OrdDouble, OrdLong, OrdTs, OrdVal}

/** Metadata-only aggregates over a graft dataset: a whole-relation
  * `COUNT(*)` / `MIN` / `MAX` (no grouping, no filter) is answered
  * straight from the sidecar zone maps — zero files opened, the scan
  * disappears from the physical plan entirely (the lakehouse
  * "metadata-only query" optimization; the reference keeps the same
  * stats in its `_opdmd` sidecar, ref base.py:58-62, but only its own
  * planner reads them — here ANY Spark SQL consumer gets the shortcut).
  *
  * Correct by construction, conservatively:
  *  - `COUNT(*)`/`COUNT(lit)`: the exact per-file row counts are
  *    maintained by every commit. `COUNT(col)` (non-null count) is NOT
  *    tracked, so it bails to the scan.
  *  - `MIN`/`MAX` of the ordered column: exact full-value zone map.
  *  - `MIN`/`MAX` of a secondary numeric/timestamp column: exact
  *    per-file [[graft.store.ColStat]] min/max (aggregate min/max
  *    ignore nulls, and so do the parquet-side stats they were
  *    collected from — same semantics). Bails unless EVERY live file
  *    carries the stat (a file whose stat was dropped — all-null, or
  *    written pre-feature, or beyond the stat-column cap — makes the
  *    metadata answer incomplete). String stats are prefix-truncated
  *    (not exact values), so string min/max always bails.
  *  - DISTINCT, FILTER clauses, expressions over the aggregate, WHERE
  *    on the relation: bail — Spark runs the ordinary scan-based plan.
  *
  * 100 TB design: answering from the sidecar is O(#files) driver-side
  * work on already-loaded metadata — the difference between a free
  * lookup and a full corpus scan for the most common exploratory
  * queries (`SELECT count(*) …`, freshness checks `max(ts)`).
  */
object GraftStatsAgg extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg: Aggregate
        if agg.groupingExpressions.isEmpty &&
          agg.aggregateExpressions.nonEmpty =>
      metaOf(agg.child) match {
        case Some(m) =>
          val vals = agg.aggregateExpressions.map(answer(_, m))
          if (vals.forall(_.isDefined))
            LocalRelation(agg.output,
              Seq(InternalRow.fromSeq(vals.map(_.get.orNull))))
          else agg
        case None => agg
      }
  }

  /** The sidecar meta iff `plan` is (a pure column selection over) a
    * graft relation — any Filter/join/etc. in between disqualifies.
    */
  private def metaOf(plan: LogicalPlan): Option[DatasetMeta] = plan match {
    case lr: LogicalRelation => lr.relation match {
      case h: HadoopFsRelation => h.location match {
        case g: GraftFileIndex => Some(g.meta)
        case _                 => None
      }
      case _ => None
    }
    case p: Project if p.projectList.forall(_.isInstanceOf[AttributeReference]) =>
      metaOf(p.child)
    case _ => None
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
    else if (a.name.equalsIgnoreCase(m.orderedOn)) {
      val v = m.files.map(f => if (isMin) f.min else f.max)
        .reduce((x, y) => if ((x < y) == isMin) x else y)
      internal(v, a.dataType).map(Some(_))
    } else {
      val sides = m.files.map(_.cols.collectFirst {
        case (n, st) if n.equalsIgnoreCase(a.name) =>
          if (isMin) st.min else st.max
      }.flatten)
      if (sides.exists(_.isEmpty)) None
      else {
        val v = sides.flatten
          .reduce((x, y) => if ((x < y) == isMin) x else y)
        internal(v, a.dataType).map(Some(_))
      }
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
