package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Gap-based sessionization — session windows over an ordered event
  * stream (beyond the reference, which has no session bins — SURVEY
  * §2.12 T5; a standard need for events/training-data pipelines).
  *
  * A new session starts where the gap to the previous event of the same
  * key exceeds `gap`. The classic two-window formulation: a lag marks
  * session starts, a running sum numbers them. Both windows are
  * partitioned by the session key, so the data shuffles ONCE on the key
  * and both window passes run on the same sorted partition — with
  * many keys this parallelizes like any keyed aggregation and no
  * single-partition window exists anywhere.
  *
  * (Structured Streaming's native equivalent is
  * `session_window(ts, gap)`; this is the batch form that matches a
  * DuckDB oracle exactly.)
  */
object Sessionize {

  /** Adds `session_idx` (0-based per key, in (ts, tie) order). */
  def withSessionIdx(df: DataFrame, keyCols: Seq[String], ts: Column,
      tie: Column, gap: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ts, tie)
    val prev = lag(ts, 1).over(w)
    val isNew = when(
      prev.isNull || ts > prev + expr(s"INTERVAL $gap"), 1L).otherwise(0L)
    df.withColumn("__new", isNew)
      .withColumn("session_idx",
        sum(col("__new")).over(
          Window.partitionBy(keyCols.map(col): _*).orderBy(ts, tie)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
      .drop("__new")
  }

  /** One row per (key, session): bounds and the five agg kernels are
    * available downstream; here start/end/count as the canonical shape.
    */
  def sessions(df: DataFrame, keyCols: Seq[String], ts: Column, tie: Column,
      gap: String, aggs: Seq[Column]): DataFrame = {
    val withIdx = withSessionIdx(df, keyCols, ts, tie, gap)
    withIdx.groupBy((keyCols.map(col) :+ col("session_idx")): _*)
      .agg(min(ts).as("session_start"),
        (max(ts).as("session_end") +: aggs): _*)
  }
}
