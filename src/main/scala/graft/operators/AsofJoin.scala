package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join for ordered data — attach to each left row the nearest
  * right row per key at or before (backward) / at or after (forward)
  * its timestamp. The natural companion of an ordered store (the
  * reference's zipper iteration, W4, solves the two-dataset variant of
  * the same alignment problem; ref store/iter_intersections.py).
  *
  * Implementation is the set-oriented union + ONE window pass:
  * tag sides, align schemas, union, then `last(ignoreNulls)` over
  * (key, ts, side) with an unbounded-preceding frame (resp. `first`
  * over the following frame). Cost = one shuffle on the key — never a
  * range-join explosion, never a per-key loop; at 100 TB the shuffle
  * is the same one any per-key window already pays, and AQE handles
  * skewed keys. Ties on ts attach (inclusive), matching DuckDB's
  * `ASOF JOIN ... ON l.ts >= r.ts`; right-side duplicates on
  * (key, ts) must be resolved by the caller (keep-last upsert or a
  * window) for deterministic results.
  */
object AsofJoin {

  /** For each left row, the latest right row with `r.ts <= l.ts` on the
    * same key. `attach` names right columns to carry over; they must
    * not collide with left column names. Left rows with no matching
    * right row keep nulls (left-join semantics).
    */
  def backward(left: DataFrame, right: DataFrame, on: Seq[String],
      tsCol: String, attach: Seq[String]): DataFrame =
    asof(left, right, on, tsCol, attach, forward = false)

  /** For each left row, the earliest right row with `r.ts >= l.ts` on
    * the same key. */
  def forward(left: DataFrame, right: DataFrame, on: Seq[String],
      tsCol: String, attach: Seq[String]): DataFrame =
    asof(left, right, on, tsCol, attach, forward = true)

  private def asof(left: DataFrame, right: DataFrame, on: Seq[String],
      tsCol: String, attach: Seq[String], forward: Boolean): DataFrame = {
    val lcols = left.columns.toSeq
    require(attach.forall(!lcols.contains(_)),
      s"attach columns ${attach.filter(lcols.contains)} collide with " +
        "left columns; alias them on the right side first")
    // side ordering controls the tie rule: the right row must fall
    // INSIDE the left row's frame at equal ts — i.e. sort before the
    // left row in scan order for both directions (forward scans ts
    // DESCENDING, see below)
    val (rSide, lSide) = (0, 1)
    // the attach payload travels as ONE struct so the window picks a
    // whole right ROW atomically — per-column last/first(ignoreNulls)
    // would backfill a null attach value from an older right row,
    // fabricating a combination that never existed
    val rStructType = org.apache.spark.sql.types.StructType(
      attach.map(c => right.schema(c).copy(name = c)))
    val lTagged = left.select(
      lcols.map(col) :+
        lit(null).cast(rStructType).as("__r") :+
        lit(lSide).as("__side"): _*)
    // a null-ts right row satisfies no `r.ts <= l.ts` predicate, but
    // asc ordering sorts nulls FIRST — it would enter every frame and
    // fabricate matches; drop it up front. Same for null JOIN KEYS:
    // Window.partitionBy groups SQL nulls into one partition, but an
    // equi-key asof (DuckDB `ON l.k = r.k AND ...`) never matches null
    // keys — a null-key right row must attach to nothing (null-key
    // LEFT rows then sit alone in the null partition and keep nulls)
    val rTagged = right
      .filter(on.map(col(_).isNotNull).foldLeft(col(tsCol).isNotNull)(_ && _))
      .select(
      (on.map(col) :+ col(tsCol)) ++
        lcols.filterNot(c => on.contains(c) || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(attach.map(col): _*).as("__r") :+
        lit(rSide).as("__side"): _*)
    // BOTH directions use the running [unboundedPreceding, currentRow]
    // frame, which Spark evaluates incrementally in O(n) per
    // partition; forward simply scans ts DESCENDING, where "last right
    // seen so far" is the earliest right at-or-after the left row. The
    // symmetric formulation — first() over [currentRow,
    // unboundedFollowing] — uses Spark's UnboundedFollowing frame,
    // which RESCANS from each row to the partition end: O(n²) per key,
    // measured 9× at a 10× events table (SCALE.md).
    val ord = if (forward) col(tsCol).desc else col(tsCol).asc
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(ord, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val picked = last(col("__r"), ignoreNulls = true).over(w)
    // a null-ts LEFT row has no defined match either (desc ordering
    // sorts nulls last — it would see every right row); keep the row,
    // mask the attach
    val masked = when(col(tsCol).isNotNull, picked)
    lTagged.unionByName(rTagged)
      .select(lcols.map(col) :+ masked.as("__p") :+ col("__side"): _*)
      .filter(col("__side") === lSide)
      .select(lcols.map(col) ++
        attach.map(c => col(s"__p.$c").as(c)): _*)
  }
}
