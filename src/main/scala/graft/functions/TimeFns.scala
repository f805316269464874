package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.agg.SegmentAgg

/** The reference's two timestamp scalar functions (SURVEY §2.11; ref
  * oups/date_utils.py:13-62): floor/ceil a timestamp to a frequency,
  * including non-fixed calendar frequencies (week/month/quarter/year)
  * where interval arithmetic isn't constant-width.
  *
  * Fixed frequencies are epoch-aligned integer arithmetic on
  * microseconds (codegen'd, no UDF); calendar frequencies go through
  * `date_trunc` + `add_months`. `ceil_ts` is the identity on values
  * already on a boundary (ref date_utils.py:55-58), otherwise the next
  * boundary.
  */
object TimeFns {

  private val Calendar = Set("week", "month", "quarter", "year")

  /** Greatest frequency boundary <= ts. */
  def floor_ts(ts: Column, freq: String): Column =
    SegmentAgg.timeBin(ts, freq, closed = "left", label = "left")

  /** Least frequency boundary >= ts (identity if ts is on a boundary). */
  def ceil_ts(ts: Column, freq: String): Column = {
    val f = freq.trim.toLowerCase
    if (Calendar.contains(f)) {
      val start = date_trunc(f, ts).cast("timestamp_ntz")
      val next = f match {
        case "month"   => add_months(start, 1).cast("timestamp_ntz")
        case "quarter" => add_months(start, 3).cast("timestamp_ntz")
        case "year"    => add_months(start, 12).cast("timestamp_ntz")
        case "week"    => (start + expr("INTERVAL 7 DAYS"))
          .cast("timestamp_ntz")
      }
      when(ts === start, ts).otherwise(next)
    } else {
      // zone-free wall-clock alignment (see SegmentAgg.wallClockMicros):
      // pmod(-us, step) is 0 on a boundary, so this is the identity there
      val step = SegmentAgg.fixedFreqMicros(f)
      val us = SegmentAgg.wallClockMicros(ts)
      SegmentAgg.addMicros(pmod(lit(0L) - us, lit(step)), ts)
    }
  }
}
