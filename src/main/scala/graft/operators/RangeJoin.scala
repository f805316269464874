package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.SparkInternals
import org.apache.spark.sql.catalyst.expressions.IntegralDivide

/** Binned point-in-interval range join — `SELECT * FROM p JOIN i ON
  * p.x BETWEEN i.lo AND i.hi` without an equality key.
  *
  * Spark's built-in plan for a pure non-equi join is
  * BroadcastNestedLoopJoin: every point row is tested against every
  * interval — O(|P|·|I|) work that dies as soon as neither side fits a
  * broadcast. The standard scale shape (the same one Databricks' range
  * join optimization and KDB's window joins use) is binning: quantize
  * the domain into fixed-width bins, emit each interval once per bin it
  * overlaps, and equi-join on the bin id. The join becomes a shuffle
  * hash join on a short key; each (point, interval) match is produced
  * exactly once because a point belongs to exactly one bin. Cost =
  * |P| + Σ(interval span / binWidth) join rows — pick `binWidth` near
  * the median interval length so the explode factor stays O(1). Bins
  * with pathological point density are ordinary join skew, which AQE
  * handles.
  *
  * Both inputs keep all their columns (they must not collide); the
  * match condition is inclusive on both ends: lo <= x <= hi.
  */
object RangeJoin {

  /** Exact floor division for longs at any sign: `pmod` is always in
    * [0, b), so a − pmod(a, b) is the greatest multiple of b ≤ a, and
    * integral division of an exact multiple is exact (a plain `/` on
    * longs is double division — silently lossy past 2^53; `div` alone
    * truncates toward zero — wrong for negatives).
    */
  def floorDiv(a: Column, b: Long): Column = {
    val m = a - pmod(a, lit(b))
    SparkInternals.column(IntegralDivide(
      SparkInternals.expression(m), SparkInternals.expression(lit(b))))
  }

  /** Join `points` to every `intervals` row whose [lo, hi] contains the
    * point. `pt`, `lo`, `hi` are long-domain expressions over their
    * respective inputs (epoch micros for timestamps, raw longs for
    * numeric ranges). Intervals with hi < lo match nothing.
    */
  def pointInInterval(points: DataFrame, pt: Column,
      intervals: DataFrame, lo: Column, hi: Column,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val collide = points.columns.toSet intersect intervals.columns.toSet
    require(collide.isEmpty,
      s"point/interval columns collide on ${collide.mkString(", ")}; " +
        "alias one side first")
    val p = points.withColumn("__bin", floorDiv(pt, binWidth))
      .withColumn("__pt", pt)
    val iv = intervals
      .withColumn("__lo", lo).withColumn("__hi", hi)
      .filter(col("__lo") <= col("__hi"))
      .withColumn("__bin",
        explode(sequence(floorDiv(col("__lo"), binWidth),
          floorDiv(col("__hi"), binWidth))))
    p.join(iv, Seq("__bin"))
      .filter(col("__pt") >= col("__lo") && col("__pt") <= col("__hi"))
      .drop("__bin", "__pt", "__lo", "__hi")
  }

  /** Join every `left` interval [lo1, hi1] to every `right` interval
    * [lo2, hi2] that overlaps it (inclusive ends). Both sides explode
    * per overlapped bin and equi-join on the bin id; a matching pair
    * shares every bin its overlap covers, so the join restricts to the
    * ONE bin containing the overlap's start (`greatest(lo1, lo2)` —
    * inside both intervals by the overlap condition) and each pair is
    * emitted exactly once with no distinct. Degenerate intervals
    * (hi < lo) match nothing.
    */
  def intervalOverlap(left: DataFrame, lo1: Column, hi1: Column,
      right: DataFrame, lo2: Column, hi2: Column,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val collide = left.columns.toSet intersect right.columns.toSet
    require(collide.isEmpty,
      s"left/right columns collide on ${collide.mkString(", ")}; " +
        "alias one side first")
    def binned(df: DataFrame, lo: Column, hi: Column, tag: String) =
      df.withColumn(s"__lo$tag", lo).withColumn(s"__hi$tag", hi)
        .filter(col(s"__lo$tag") <= col(s"__hi$tag"))
        .withColumn("__bin",
          explode(sequence(floorDiv(col(s"__lo$tag"), binWidth),
            floorDiv(col(s"__hi$tag"), binWidth))))
    binned(left, lo1, hi1, "1").join(binned(right, lo2, hi2, "2"),
        Seq("__bin"))
      .filter(col("__lo1") <= col("__hi2") && col("__lo2") <= col("__hi1"))
      .filter(col("__bin") ===
        floorDiv(greatest(col("__lo1"), col("__lo2")), binWidth))
      .drop("__bin", "__lo1", "__hi1", "__lo2", "__hi2")
  }
}
