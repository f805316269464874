package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.agg.SegmentAgg

/** Queries covering the reference's own operator surface (SURVEY.md §2):
  * scans (S1), DNF filters (F1), range trim (F3), keep-last dedup (W1),
  * time-scale binning with closed/label semantics (G2), count binning (G3),
  * snapshots / running aggregates (A6), empty-bin spine materialization
  * (A7), plus TPC-H-style headline aggregations for the benchmark.
  *
  * Oracle-parity conventions (DuckDB hash-compare):
  *  - every query is globally ordered on its output columns (both sides);
  *  - integer sums are cast to BIGINT on the DuckDB side (SUM(BIGINT)
  *    would otherwise return HUGEINT);
  *  - double sums are accumulated in DECIMAL(38,6) — exact, associative,
  *    so shuffle order cannot change the result — then cast to DOUBLE on
  *    both sides so the output dtypes match bit-for-bit;
  *  - events.ts is TIMESTAMP(NANOS) in parquet: Spark reads it via
  *    nanosAsLong + µs conversion (Tables.events); DuckDB oracles go
  *    through a CTE casting to µs TIMESTAMP so TIMESTAMP_NS never leaks
  *    into compared output;
  *  - first/last per reference semantics (first/last row in `ordered_on`
  *    order, ref jcumsegagg.py:20-82) use min_by/max_by on `event_id`,
  *    which is monotone with `ts` in the events table.
  */
object RefQueries {

  /** Exact sum of a double column; cast to double at output. */
  private def dsum(c: Column): Column =
    sum(c.cast("decimal(38,6)")).cast("double")

  /** Shared j20/j21 body: left = all events, right = deduped marks
    * (every-20th event, keep-max-id per (user, ts)). */
  private def asofQuery(s: SparkSession, d: String, forward: Boolean)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d)
    val left = ev.select("event_id", "ts", "user_id")
    val wm = Window.partitionBy("user_id", "ts")
      .orderBy(col("mark_id").desc)
    val marks = ev.filter(col("event_id") % 20 === 0)
      .select(col("user_id"), col("ts"),
        col("event_id").as("mark_id"), col("value").as("mark_value"))
      .withColumn("__rn", row_number().over(wm))
      .filter(col("__rn") === 1).drop("__rn")
    val joined =
      if (forward)
        graft.operators.AsofJoin.forward(left, marks, Seq("user_id"),
          "ts", Seq("mark_id", "mark_value"))
      else
        graft.operators.AsofJoin.backward(left, marks, Seq("user_id"),
          "ts", Seq("mark_id", "mark_value"))
    joined.select(col("event_id"), col("user_id"),
        coalesce(col("mark_id"), lit(-1L)).as("mark_id"),
        col("mark_value"))
      .orderBy("event_id")
  }

  /** DuckDB-side CTE giving events with µs timestamps. */
  private val EV =
    """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
                       event_type, value, props FROM events)"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1: full-dataset ordered scan (ref base.py:440-459 to_pandas).
    "s1_full_scan" -> { (s, d) =>
      Tables.events(s, d)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy("event_id")
    },

    // F1: DNF row filter — OR of ANDs with ==, in, not-in, >, <=
    // (ref aggstream/utils.py:16-71).
    "f1_dnf_filter" -> { (s, d) =>
      val e = Tables.events(s, d)
      e.filter(
        (col("event_type").isin("click", "view") && col("value") > 100.0) ||
        (col("event_type") === "purchase" && !col("user_id").isin(1L, 2L, 3L)
          && col("value") <= 400.0))
        .select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy("event_id")
    },

    // F3: range trim on the ordered column (ref aggstream.py:553-569).
    // The predicate goes onto the raw int64 column so parquet row-group
    // stats prune (see Tables.eventsRange — a filter on the converted
    // timestamp pushes nothing).
    "f3_range_trim" -> { (s, d) =>
      def us(date: String): Long =
        java.time.LocalDateTime.parse(date)
          .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
      Tables.eventsRange(s, d,
          Some(us("2024-01-10T00:00:00")), Some(us("2024-01-20T00:00:00")))
        .select("event_id", "ts", "user_id", "value")
        .orderBy("event_id")
    },

    // F2: per-filter-id seed fan-out — one shared scan routed through
    // several named filter sets (ref aggstream.py:571-591, 1254-1328).
    "f2_filter_fanout" -> { (s, d) =>
      val e = Tables.events(s, d)
      val fanout = Seq(
        "clicks_hi" -> (col("event_type") === "click"
          && col("value") > 200.0),
        "errors" -> (col("event_type") === "error"))
      fanout.map { case (fid, f) =>
        e.filter(f)
          .groupBy(date_trunc("day", col("ts")).cast("timestamp_ntz")
            .as("bin"))
          .agg(dsum(col("value")).as("sum_value"),
            count(lit(1)).as("n_rows"))
          .select(lit(fid).as("filter_id"), col("bin"), col("sum_value"),
            col("n_rows"))
      }.reduce(_ unionByName _).orderBy("filter_id", "bin")
    },

    // G2 with an explicit Series of bin edges (ref by_scale with a
    // DatetimeIndex of ends): custom, irregular bins.
    "g2_custom_edges" -> { (s, d) =>
      val edges = Seq("2024-01-01", "2024-01-05", "2024-01-12",
        "2024-01-20", "2024-01-27")
        .map(x => java.time.LocalDate.parse(x).atStartOfDay())
      Tables.events(s, d)
        .groupBy(SegmentAgg.edgeBin(col("ts"), edges).as("bin"))
        .agg(
          min_by(col("value"), col("event_id")).as("first_value"),
          max_by(col("value"), col("event_id")).as("last_value"),
          min("value").as("min_value"),
          max("value").as("max_value"),
          dsum(col("value")).as("sum_value"),
          count(lit(1)).as("n_rows"))
        .orderBy("bin")
    },

    // §2.11 scalar functions: floor_ts / ceil_ts to a fixed and a
    // calendar frequency (ref date_utils.py:13-62). Ceil is identity on
    // boundary values.
    "x_floor_ceil_ts" -> { (s, d) =>
      import graft.functions.TimeFns._
      Tables.events(s, d).select(
        col("event_id"),
        floor_ts(col("ts"), "1 hour").as("floor_hour"),
        ceil_ts(col("ts"), "1 hour").as("ceil_hour"),
        floor_ts(col("ts"), "month").as("floor_month"),
        ceil_ts(col("ts"), "month").as("ceil_month"))
        .orderBy("event_id")
    },

    // §2.13 user-supplied segmentation (the bin_by Callable contract):
    // an arbitrary user column function — here day-of-week — drives the
    // same aggregate machinery as the built-in time/edge policies.
    "g6_user_bin" -> { (s, d) =>
      import graft.agg.{AggFn, AggSpec, BinBy}
      val byDow = BinBy.ByExpr(o => (dayofweek(o) - 1).cast("long"))
      val specs = Seq(
        AggSpec("first_value", "value", AggFn.First),
        AggSpec("last_value", "value", AggFn.Last),
        AggSpec("min_value", "value", AggFn.Min),
        AggSpec("max_value", "value", AggFn.Max),
        AggSpec("sum_value", "value", AggFn.Sum))
      SegmentAgg.aggregate(Tables.events(s, d), byDow, "ts", specs,
        col("event_id"))
        .orderBy("bin")
    },

    // A6 with the reference's empty-snapshot forwarding (ref
    // jcumsegagg.py preserve_res): every 6h snapshot point of each
    // non-empty day gets a row; empty points forward the bin's running
    // value, points before the bin's first data stay null.
    "a8_snapshot_spine" -> { (s, d) =>
      import graft.agg.{AggFn, AggSpec}
      val specs = Seq(
        AggSpec("first_value", "value", AggFn.First),
        AggSpec("last_value", "value", AggFn.Last),
        AggSpec("min_value", "value", AggFn.Min),
        AggSpec("max_value", "value", AggFn.Max),
        AggSpec("sum_value", "value", AggFn.Sum))
      SegmentAgg.snapshotsWithSpine(
        Tables.events(s, d)
          .filter(col("event_type") === "purchase" && col("value") > 180.0),
        date_trunc("day", col("ts")).cast("timestamp_ntz"),
        SegmentAgg.timeBin(col("ts"), "6 hours"),
        specs, col("event_id"), "1 DAY", "6 HOURS")
        .orderBy("bin", "snap")
    },

    // Sliding (hopping) windows, beyond-reference: 1-day windows every
    // 12 hours via the built-in window(); each row lands in W/H
    // windows map-side, then one shuffle on the window start.
    "g8_sliding" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 day", "12 hours")
          .getField("start").cast("timestamp_ntz").as("win_start"))
        .agg(
          min_by(col("value"), col("event_id")).as("first_value"),
          max_by(col("value"), col("event_id")).as("last_value"),
          min("value").as("min_value"),
          max("value").as("max_value"),
          dsum(col("value")).as("sum_value"),
          count(lit(1)).as("n_rows"))
        .orderBy("win_start")
    },

    // Session windows (beyond-reference T5): 30-minute-gap sessions per
    // user — one shuffle on the key, two window passes on the same sort.
    "g7_sessions" -> { (s, d) =>
      import graft.agg.Sessionize
      Sessionize.sessions(Tables.events(s, d), Seq("user_id"), col("ts"),
        col("event_id"), "30 minutes",
        Seq(dsum(col("value")).as("sum_value"),
          count(lit(1)).as("n_events")))
        .orderBy("user_id", "session_idx")
    },

    // W1: keep-last dedup on a subset ∪ {ordered_on}
    // (ref write.py:199-203, iter_merge_split_data.py:113-119): last row
    // per user_id in (ts, event_id) order wins.
    "w1_dedup_keep_last" -> { (s, d) =>
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "ts", "event_id", "event_type", "value")
        .orderBy("user_id")
    },

    // G2 + A1-A5: tumbling 5-minute bins, left-closed left-labeled,
    // all five agg kernels (ref segmentby.py:141-368, jcumsegagg.py).
    "g2_time_bins_5m" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "5 minutes").getField("start").as("bin"))
        .agg(
          min_by(col("value"), col("event_id")).as("first_value"),
          max_by(col("value"), col("event_id")).as("last_value"),
          min("value").as("min_value"),
          max("value").as("max_value"),
          dsum(col("value")).as("sum_value"),
          count(lit(1)).as("n_rows"))
        .orderBy("bin")
    },

    // G2 closed='right', label='right': a row exactly on a day boundary
    // belongs to the bin *ending* there (ref segmentby.py by_scale
    // closed/label semantics).
    "g2_time_bins_1d_right" -> { (s, d) =>
      val label = date_trunc("day", col("ts") - expr("INTERVAL 1 MICROSECOND"))
        .cast("timestamp_ntz") + expr("INTERVAL 1 DAY")
      Tables.events(s, d)
        .groupBy(label.as("bin_end"))
        .agg(
          min_by(col("value"), col("event_id")).as("first_value"),
          max_by(col("value"), col("event_id")).as("last_value"),
          min("value").as("min_value"),
          max("value").as("max_value"),
          dsum(col("value")).as("sum_value"),
          count(lit(1)).as("n_rows"))
        .orderBy("bin_end")
    },

    // G3: by_x_rows — bins of exactly N rows in stream order, labeled by
    // the first ordered_on value of the bin (ref segmentby.py:371-520).
    // Distributed two-pass row numbering (no single-partition window).
    "g3_by_x_rows" -> { (s, d) =>
      SegmentAgg.xRowsBins(Tables.events(s, d), "ts", 500, col("event_id"))
        .groupBy("bin_id")
        .agg(
          min("ts").as("bin_label"),
          min_by(col("value"), col("event_id")).as("first_value"),
          max_by(col("value"), col("event_id")).as("last_value"),
          min("value").as("min_value"),
          max("value").as("max_value"),
          dsum(col("value")).as("sum_value"),
          count(lit(1)).as("n_rows"))
        .orderBy("bin_id")
    },

    // A7: empty bins materialized with typed nulls via a generated spine
    // (ref cumsegagg.py:532-569 NULL_DICT; Spark emits no empty groups so
    // the spine left-join is required for parity).
    "a7_empty_bins" -> { (s, d) =>
      val base = Tables.events(s, d).filter(col("event_type") === "signup")
      val bounds = base.agg(
        date_trunc("hour", min("ts")).cast("timestamp_ntz").as("lo"),
        date_trunc("hour", max("ts")).cast("timestamp_ntz").as("hi"))
      val spine = bounds.select(
        explode(expr("sequence(lo, hi, INTERVAL 1 HOUR)")).as("bin"))
      val agg0 = base
        .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("bin"))
        .agg(
          min("value").as("min_value"),
          max("value").as("max_value"),
          dsum(col("value")).as("sum_value"),
          count(lit(1)).cast("long").as("n_rows"))
      spine.join(agg0, Seq("bin"), "left")
        .select("bin", "min_value", "max_value", "sum_value", "n_rows")
        .orderBy("bin")
    },

    // A6/T6: snapshots — running aggregate of the in-progress bin sampled
    // at a finer grid (ref jcumsegagg.py:230-417 preserve_res): 1-day bins
    // observed at 6-hour snapshot points.
    "a6_snapshots" -> { (s, d) =>
      val pre = Tables.events(s, d)
        .groupBy(
          date_trunc("day", col("ts")).cast("timestamp_ntz").as("bin"),
          window(col("ts"), "6 hours").getField("start").as("snap"))
        .agg(
          min_by(col("value"), col("event_id")).as("c_first"),
          max_by(col("value"), col("event_id")).as("c_last"),
          min("value").as("c_min"),
          max("value").as("c_max"),
          sum(col("value").cast("decimal(38,6)")).as("c_sum"),
          count(lit(1)).as("c_n"))
      val w = Window.partitionBy("bin").orderBy("snap")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      pre.select(
        col("bin"), col("snap"),
        first("c_first").over(w).as("first_value"),
        last("c_last").over(w).as("last_value"),
        min("c_min").over(w).as("min_value"),
        max("c_max").over(w).as("max_value"),
        sum("c_sum").over(w).cast("double").as("sum_value"),
        sum("c_n").over(w).cast("long").as("n_rows"))
        .orderBy("bin", "snap")
    },

    // G2 calendar (non-fixed) frequency: monthly bins, right label —
    // months cannot use window(), they go through date_trunc/add_months
    // (SURVEY §7.5 risk 5).
    "g2_month_bins" -> { (s, d) =>
      // group by the left edge (one calendar-trunc per row), apply the
      // right-label transform AFTER aggregation — per bin, not per row
      Tables.lineitem(s, d)
        .groupBy(SegmentAgg.timeBin(col("l_shipdate"), "month")
          .as("bin_start"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          min("l_extendedprice").as("min_price"),
          max("l_extendedprice").as("max_price"),
          count(lit(1)).as("n_rows"))
        .select(add_months(col("bin_start"), 1).cast("timestamp_ntz")
          .as("bin_end"), col("sum_qty"), col("min_price"),
          col("max_price"), col("n_rows"))
        .orderBy("bin_end")
    },

    // Headline: TPC-H Q1-style pricing summary (benchmark flagship).
    "q1_pricing_summary" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          min("l_quantity").as("min_qty"),
          max("l_quantity").as("max_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ROLLUP hierarchy totals: per (flag, status) + per-flag subtotals
    // + grand total in ONE pass — Spark expands grouping sets map-side,
    // so the shuffle still carries one partial row per (set, key);
    // grouping_id() disambiguates levels (bitmask, matches DuckDB's
    // GROUPING()).
    "q2_rollup" -> { (s, d) =>
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n_rows"),
          grouping_id().as("gid"))
        .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))
    },

    // Exact per-group quantiles (interpolated): correct at any SF but
    // sorts each group's values — at 100 TB swap in approx_percentile
    // (t-digest, mergeable partials) and keep this as the oracle-able
    // exactness baseline.
    "g9_quantiles" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          round(expr("percentile(value, 0.25)"), 6).as("p25"),
          round(expr("percentile(value, 0.5)"), 6).as("p50"),
          round(expr("percentile(value, 0.75)"), 6).as("p75"),
          round(expr("percentile(value, 0.95)"), 6).as("p95"),
          count(lit(1)).as("n_rows"))
        .orderBy("event_type")
    },

    // Skew path driver-gated: the two-phase salted aggregation must
    // produce EXACTLY the plain groupBy's answer (five kernels,
    // decimal-exact sums) — event_type is the genuinely skew-prone
    // shape (a handful of hot keys over the whole table).
    "g11_salted_agg" -> { (s, d) =>
      import graft.agg.{AggFn, AggSpec, SaltedAgg}
      val e = Tables.events(s, d)
        .select("event_id", "event_type", "value")
      SaltedAgg.aggregate(e, col("event_type"),
          Seq(
            AggSpec("first_v", "value", AggFn.First),
            AggSpec("last_v", "value", AggFn.Last),
            AggSpec("min_v", "value", AggFn.Min),
            AggSpec("max_v", "value", AggFn.Max),
            AggSpec("sum_v", "value", AggFn.Sum)),
          col("event_id"), saltBuckets = 32)
        .withColumnRenamed("bin", "event_type")
        .orderBy("event_type")
    },

    // The 100 TB quantile path: approx_percentile (mergeable sketch
    // partials, map-side combine, no per-group sort). Sketch values
    // are estimator-dependent, so — like s7_approx_distinct — the
    // query gates approx-vs-exact within tolerance and emits the
    // deterministic exact values plus boolean gates; the oracle
    // recomputes the exact side and asserts the gates true. The gate's
    // exact percentile runs over round(value, 2): Spark's exact
    // Percentile buffers a value→count map PER GROUP, so on the raw
    // continuous column its memory grows with group size — the 2-dp
    // domain caps the map at the value range × 100 entries at ANY
    // corpus size (the ≤0.005 shift is absorbed by the tolerance).
    // The production path remains the approx column alone.
    "g10_quantiles_approx" -> { (s, d) =>
      def ok(i: Int, exact: String) =
        (abs(col("q")(i) - col(exact)) <=
          greatest(abs(col(exact)) * 0.05, lit(0.05))).as(s"ok_$exact")
      Tables.events(s, d)
        .withColumn("v2", round(col("value"), 2))
        .groupBy("event_type")
        .agg(
          expr("approx_percentile(value, array(0.25, 0.5, 0.75, 0.95))")
            .as("q"),
          round(expr("percentile(v2, 0.25)"), 6).as("p25"),
          round(expr("percentile(v2, 0.5)"), 6).as("p50"),
          round(expr("percentile(v2, 0.75)"), 6).as("p75"),
          round(expr("percentile(v2, 0.95)"), 6).as("p95"),
          count(lit(1)).as("n_rows"))
        .select(col("event_type"), col("p25"), col("p50"), col("p75"),
          col("p95"), col("n_rows"),
          ok(0, "p25"), ok(1, "p50"), ok(2, "p75"), ok(3, "p95"))
        .orderBy("event_type")
    },

    // Headline: TPC-H Q5-style multi-join. nation/region are
    // constant-size (25/5 rows) so their broadcasts are always safe;
    // the customer-derived dims side scales with SF, so it carries NO
    // hint — AQE broadcasts it while it fits and shuffle-joins beyond.
    "j5_multi_join" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      val dims = c
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .select(col("c_custkey"), col("n_name"))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(dims, o("o_custkey") === dims("c_custkey"))
        .groupBy("n_name")
        .agg(
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")
    },

    // Headline: TPC-H Q18-style semi-join — orders restricted to the
    // grouped-HAVING key set via left_semi (no row duplication).
    // As-of joins (backward/forward): every event attaches the nearest
    // mark row (every-20th event) for its user at-or-before /
    // at-or-after its ts. One shuffle on the key, single window pass —
    // the set-oriented zipper (see operators.AsofJoin). Marks dedup
    // (user, ts) keep-max-id so the nearest row is deterministic; the
    // derivation is shared so the two directions (and their oracles)
    // cannot silently diverge.
    "j20_asof" -> { (s, d) => asofQuery(s, d, forward = false) },
    "j21_asof_fwd" -> { (s, d) => asofQuery(s, d, forward = true) },

    // Binned range join (no equality key): per-type time windows
    // ([10%, 40%] of each type's ts span) matched against ALL events by
    // ts containment. Naively this is a BroadcastNestedLoopJoin; the
    // binned operator turns it into an equi-join on 1-hour bin ids —
    // the shape that survives both sides growing (see
    // operators.RangeJoin).
    "j22_interval_join" -> { (s, d) =>
      import graft.agg.SegmentAgg.wallClockMicros
      import graft.operators.RangeJoin
      val ev = Tables.events(s, d)
      val iv = ev.groupBy(col("event_type").as("itype"))
        .agg(min(wallClockMicros(col("ts"))).as("tmin"),
          max(wallClockMicros(col("ts"))).as("tmax"))
        .select(col("itype"),
          (col("tmin") + RangeJoin.floorDiv(col("tmax") - col("tmin"), 10L))
            .as("lo_us"),
          (col("tmin") +
            RangeJoin.floorDiv((col("tmax") - col("tmin")) * 2, 5L))
            .as("hi_us"))
      val pts = ev.select(col("event_id"), col("value"),
        wallClockMicros(col("ts")).as("pt_us"))
      RangeJoin.pointInInterval(pts, col("pt_us"), iv,
          col("lo_us"), col("hi_us"), binWidth = 3600L * 1000000L)
        .groupBy("itype")
        .agg(count(lit(1)).as("n_events"),
          dsum(col("value")).as("sum_value"))
        .orderBy("itype")
    },

    // Interval-overlap join (no equality key): per-user sessions ×
    // per-type hot windows, matched by time overlap. Both interval
    // sets explode per overlapped 1-hour bin; the pair is kept only in
    // the bin holding the overlap's start, so no dedup is needed (see
    // operators.RangeJoin.intervalOverlap).
    "j23_overlap_join" -> { (s, d) =>
      import graft.agg.{Sessionize, SegmentAgg}
      import graft.operators.RangeJoin
      val ev = Tables.events(s, d)
      val sess = Sessionize.sessions(ev, Seq("user_id"), col("ts"),
          col("event_id"), "30 minutes", Seq.empty)
        .select(col("user_id"), col("session_idx"),
          SegmentAgg.wallClockMicros(col("session_start")).as("s_lo"),
          SegmentAgg.wallClockMicros(col("session_end")).as("s_hi"))
      val iv = ev.groupBy(col("event_type").as("itype"))
        .agg(min(SegmentAgg.wallClockMicros(col("ts"))).as("tmin"),
          max(SegmentAgg.wallClockMicros(col("ts"))).as("tmax"))
        .select(col("itype"),
          (col("tmin") + RangeJoin.floorDiv(col("tmax") - col("tmin"), 10L))
            .as("lo_us"),
          (col("tmin") +
            RangeJoin.floorDiv((col("tmax") - col("tmin")) * 2, 5L))
            .as("hi_us"))
      RangeJoin.intervalOverlap(sess, col("s_lo"), col("s_hi"),
          iv, col("lo_us"), col("hi_us"), binWidth = 3600L * 1000000L)
        .groupBy("itype")
        .agg(count(lit(1)).as("n_sessions"),
          count_distinct(col("user_id")).as("n_users"))
        .orderBy("itype")
    },

    "j18_semi_join" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val big = li.groupBy("l_orderkey")
        .agg(dsum(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 150.0)
      o.join(big, o("o_orderkey") === big("l_orderkey"), "left_semi")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy("o_orderkey")
    },

    // Anti-join (TPC-H Q22 shape): customers with no HIGH-VALUE order.
    // left_anti against the slim distinct-custkey projection of the
    // filtered orders — the build side is keys only (filter pushed
    // below the distinct), and AQE broadcasts it when small.
    "j19_anti_join" -> { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
        .filter(col("o_totalprice") > 400000.0)
        .select("o_custkey").distinct()
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
        .orderBy("c_custkey")
    },

    // Analytic window functions over an ordered stream: per-user
    // inter-event gap via lag(), plus a rank within the user's events
    // — one shuffle on user_id, both functions in the same window pass.
    "g12_event_gaps" -> { (s, d) =>
      val e = Tables.events(s, d)
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val us = graft.agg.SegmentAgg.wallClockMicros(col("ts"))
      e.select(col("event_id"), col("user_id"), col("ts"),
          (us - lag(us, 1).over(w)).as("gap_us"),
          row_number().over(w).as("user_seq"))
        .orderBy("event_id")
    },

    // Headline: join + aggregation. orders is a fact table (~1/4 of
    // lineitem's rows), so no broadcast hint: AQE broadcasts it at small
    // SF where it fits and falls back to a shuffle join at scale, where
    // a forced broadcast build side would exceed executor memory.
    "j1_join_agg" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderpriority"),
          date_trunc("month", col("o_orderdate")).cast("timestamp_ntz").as("month"))
        .agg(
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("o_orderpriority", "month")
    }
  )

  def oracleSql: Map[String, String] = Map(
    "s1_full_scan" -> s"""$EV
         SELECT event_id, ts, user_id, event_type, value
         FROM e ORDER BY event_id""",

    "f1_dnf_filter" -> s"""$EV
         SELECT event_id, ts, user_id, event_type, value FROM e
         WHERE (event_type IN ('click','view') AND value > 100.0)
            OR (event_type = 'purchase' AND user_id NOT IN (1,2,3)
                AND value <= 400.0)
         ORDER BY event_id""",

    "f3_range_trim" -> s"""$EV
         SELECT event_id, ts, user_id, value FROM e
         WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
           AND ts <  TIMESTAMP '2024-01-20 00:00:00'
         ORDER BY event_id""",

    "f2_filter_fanout" -> s"""$EV
         SELECT 'clicks_hi' AS filter_id, date_trunc('day', ts) AS bin,
              CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
              count(*) AS n_rows
         FROM e WHERE event_type = 'click' AND value > 200.0 GROUP BY 2
         UNION ALL
         SELECT 'errors' AS filter_id, date_trunc('day', ts) AS bin,
              CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
              count(*) AS n_rows
         FROM e WHERE event_type = 'error' GROUP BY 2
         ORDER BY filter_id, bin""",

    "g2_custom_edges" -> s"""$EV
         SELECT CASE
                WHEN ts >= TIMESTAMP '2024-01-27' THEN TIMESTAMP '2024-01-27'
                WHEN ts >= TIMESTAMP '2024-01-20' THEN TIMESTAMP '2024-01-20'
                WHEN ts >= TIMESTAMP '2024-01-12' THEN TIMESTAMP '2024-01-12'
                WHEN ts >= TIMESTAMP '2024-01-05' THEN TIMESTAMP '2024-01-05'
                WHEN ts >= TIMESTAMP '2024-01-01' THEN TIMESTAMP '2024-01-01'
                ELSE NULL END AS bin,
              min_by(value, event_id) AS first_value,
              max_by(value, event_id) AS last_value,
              min(value) AS min_value, max(value) AS max_value,
              CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
              count(*) AS n_rows
         FROM e GROUP BY 1 ORDER BY 1""",

    "x_floor_ceil_ts" -> s"""$EV
         SELECT event_id,
              time_bucket(INTERVAL '1 hour', ts) AS floor_hour,
              CASE WHEN time_bucket(INTERVAL '1 hour', ts) = ts THEN ts
                   ELSE time_bucket(INTERVAL '1 hour', ts) + INTERVAL 1 HOUR
                   END AS ceil_hour,
              date_trunc('month', ts) AS floor_month,
              CASE WHEN date_trunc('month', ts) = ts THEN ts
                   ELSE date_trunc('month', ts) + INTERVAL 1 MONTH
                   END AS ceil_month
         FROM e ORDER BY event_id""",

    "g6_user_bin" -> s"""$EV
         SELECT dayofweek(ts) AS bin,
              min_by(value, event_id) AS first_value,
              max_by(value, event_id) AS last_value,
              min(value) AS min_value, max(value) AS max_value,
              CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
         FROM e GROUP BY 1 ORDER BY 1""",

    "a8_snapshot_spine" -> s"""$EV,
         base AS (
           SELECT bin, snap,
                first_value(c_first) OVER w AS first_value,
                last_value(c_last) OVER w AS last_value,
                min(c_min) OVER w AS min_value,
                max(c_max) OVER w AS max_value,
                CAST(sum(c_sum) OVER w AS DOUBLE) AS sum_value
           FROM (SELECT date_trunc('day', ts) AS bin,
                        time_bucket(INTERVAL '6 hours', ts) AS snap,
                        min_by(value, event_id) AS c_first,
                        max_by(value, event_id) AS c_last,
                        min(value) AS c_min, max(value) AS c_max,
                        SUM(CAST(value AS DECIMAL(38,6))) AS c_sum
                 FROM e WHERE event_type = 'purchase' AND value > 180.0
                 GROUP BY 1, 2)
           WINDOW w AS (PARTITION BY bin ORDER BY snap
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         bins AS (SELECT DISTINCT bin FROM base),
         spine AS (SELECT bin, unnest(generate_series(bin,
                        bin + INTERVAL 18 HOUR, INTERVAL 6 HOUR)) AS snap
                   FROM bins)
       SELECT spine.bin, spine.snap,
            last_value(first_value IGNORE NULLS) OVER w2 AS first_value,
            last_value(last_value IGNORE NULLS) OVER w2 AS last_value,
            last_value(min_value IGNORE NULLS) OVER w2 AS min_value,
            last_value(max_value IGNORE NULLS) OVER w2 AS max_value,
            last_value(sum_value IGNORE NULLS) OVER w2 AS sum_value
       FROM spine LEFT JOIN base USING (bin, snap)
       WINDOW w2 AS (PARTITION BY spine.bin ORDER BY spine.snap
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       ORDER BY bin, snap""",

    "g8_sliding" -> s"""$EV
         SELECT time_bucket(INTERVAL '12 hours', ts)
                  - k * (INTERVAL '12 hours') AS win_start,
              min_by(value, event_id) AS first_value,
              max_by(value, event_id) AS last_value,
              min(value) AS min_value, max(value) AS max_value,
              CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
                AS sum_value,
              count(*) AS n_rows
         FROM e CROSS JOIN (SELECT unnest([0, 1]) AS k) ks
         GROUP BY 1 ORDER BY 1""",

    "g7_sessions" -> s"""$EV
         SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
              min(ts) AS session_start, max(ts) AS session_end,
              CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
                AS sum_value,
              count(*) AS n_events
         FROM (
           SELECT *, SUM(is_new) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
           FROM (
             SELECT *, CASE WHEN lag(ts) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  OR ts > lag(ts) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id)
                     + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
             FROM e))
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "w1_dedup_keep_last" -> s"""$EV
         SELECT user_id, ts, event_id, event_type, value FROM (
           SELECT *, row_number() OVER (
             PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
           FROM e) WHERE rn = 1
         ORDER BY user_id""",

    "g2_time_bins_5m" -> s"""$EV
         SELECT time_bucket(INTERVAL '5 minutes', ts) AS bin,
              min_by(value, event_id) AS first_value,
              max_by(value, event_id) AS last_value,
              min(value) AS min_value, max(value) AS max_value,
              CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
              count(*) AS n_rows
         FROM e GROUP BY 1 ORDER BY 1""",

    "g2_time_bins_1d_right" -> s"""$EV
         SELECT date_trunc('day', ts - INTERVAL 1 MICROSECOND)
                + INTERVAL 1 DAY AS bin_end,
              min_by(value, event_id) AS first_value,
              max_by(value, event_id) AS last_value,
              min(value) AS min_value, max(value) AS max_value,
              CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
              count(*) AS n_rows
         FROM e GROUP BY 1 ORDER BY 1""",

    "g3_by_x_rows" -> s"""$EV
         SELECT CAST(floor((rn - 1) / 500) AS BIGINT) AS bin_id,
              min(ts) AS bin_label,
              min_by(value, event_id) AS first_value,
              max_by(value, event_id) AS last_value,
              min(value) AS min_value, max(value) AS max_value,
              CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
              count(*) AS n_rows
         FROM (SELECT *, row_number() OVER (ORDER BY ts, event_id) AS rn
               FROM e)
         GROUP BY 1 ORDER BY 1""",

    "a7_empty_bins" -> s"""$EV,
            base AS (SELECT * FROM e WHERE event_type = 'signup'),
            b AS (SELECT date_trunc('hour', min(ts)) AS lo,
                         date_trunc('hour', max(ts)) AS hi FROM base),
            spine AS (SELECT unnest(generate_series(lo, hi,
                          INTERVAL 1 HOUR)) AS bin FROM b),
            a AS (SELECT date_trunc('hour', ts) AS bin,
                         min(value) AS min_value, max(value) AS max_value,
                         CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
                           AS sum_value,
                         count(*) AS n_rows
                  FROM base GROUP BY 1)
         SELECT spine.bin, a.min_value, a.max_value, a.sum_value, a.n_rows
         FROM spine LEFT JOIN a ON spine.bin = a.bin
         ORDER BY spine.bin""",

    "a6_snapshots" -> s"""$EV
         SELECT bin, snap,
              first_value(c_first) OVER w AS first_value,
              last_value(c_last) OVER w AS last_value,
              min(c_min) OVER w AS min_value,
              max(c_max) OVER w AS max_value,
              CAST(sum(c_sum) OVER w AS DOUBLE) AS sum_value,
              CAST(sum(c_n) OVER w AS BIGINT) AS n_rows
         FROM (SELECT date_trunc('day', ts) AS bin,
                      time_bucket(INTERVAL '6 hours', ts) AS snap,
                      min_by(value, event_id) AS c_first,
                      max_by(value, event_id) AS c_last,
                      min(value) AS c_min, max(value) AS c_max,
                      SUM(CAST(value AS DECIMAL(38,6))) AS c_sum,
                      count(*) AS c_n
               FROM e GROUP BY 1, 2)
         WINDOW w AS (PARTITION BY bin ORDER BY snap
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY bin, snap""",

    "g2_month_bins" ->
      """SELECT CAST(date_trunc('month', l_shipdate) + INTERVAL 1 MONTH
                AS TIMESTAMP) AS bin_end,
              CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
                AS sum_qty,
              min(l_extendedprice) AS min_price,
              max(l_extendedprice) AS max_price,
              count(*) AS n_rows
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
              CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
                AS sum_base_price,
              CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
              min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
              count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "j5_multi_join" ->
      """SELECT n_name,
              CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
              count(*) AS n_items
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
         GROUP BY 1 ORDER BY 1""",

    "q2_rollup" ->
      """SELECT l_returnflag, l_linestatus,
              CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
                AS sum_qty,
              count(*) AS n_rows,
              CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
         FROM lineitem
         GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY gid, l_returnflag, l_linestatus""",

    "g9_quantiles" -> s"""$EV
       SELECT event_type,
              round(quantile_cont(value, 0.25), 6) AS p25,
              round(quantile_cont(value, 0.5), 6) AS p50,
              round(quantile_cont(value, 0.75), 6) AS p75,
              round(quantile_cont(value, 0.95), 6) AS p95,
              count(*) AS n_rows
       FROM e GROUP BY event_type ORDER BY event_type""",

    "g10_quantiles_approx" -> s"""$EV
       SELECT event_type,
              round(quantile_cont(round(value, 2), 0.25), 6) AS p25,
              round(quantile_cont(round(value, 2), 0.5), 6) AS p50,
              round(quantile_cont(round(value, 2), 0.75), 6) AS p75,
              round(quantile_cont(round(value, 2), 0.95), 6) AS p95,
              count(*) AS n_rows,
              true AS ok_p25, true AS ok_p50,
              true AS ok_p75, true AS ok_p95
       FROM e GROUP BY event_type ORDER BY event_type""",

    "g11_salted_agg" -> s"""$EV
       SELECT event_type,
              arg_min(value, event_id) AS first_v,
              arg_max(value, event_id) AS last_v,
              min(value) AS min_v, max(value) AS max_v,
              CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_v
       FROM e GROUP BY event_type ORDER BY event_type""",

    "j20_asof" -> s"""$EV,
         marks AS (
           SELECT user_id, ts, event_id AS mark_id, value AS mark_value
           FROM e WHERE event_id % 20 = 0
           QUALIFY row_number() OVER (PARTITION BY user_id, ts
                                      ORDER BY event_id DESC) = 1)
       SELECT e.event_id, e.user_id,
              CAST(COALESCE(m.mark_id, -1) AS BIGINT) AS mark_id,
              m.mark_value
       FROM e ASOF LEFT JOIN marks m
         ON e.user_id = m.user_id AND e.ts >= m.ts
       ORDER BY event_id""",

    "j21_asof_fwd" -> s"""$EV,
         marks AS (
           SELECT user_id, ts, event_id AS mark_id, value AS mark_value
           FROM e WHERE event_id % 20 = 0
           QUALIFY row_number() OVER (PARTITION BY user_id, ts
                                      ORDER BY event_id DESC) = 1)
       SELECT e.event_id, e.user_id,
              CAST(COALESCE(m.mark_id, -1) AS BIGINT) AS mark_id,
              m.mark_value
       FROM e ASOF LEFT JOIN marks m
         ON e.user_id = m.user_id AND e.ts <= m.ts
       ORDER BY event_id""",

    "j22_interval_join" -> s"""$EV,
         b AS (SELECT event_type AS itype,
                 min(epoch_us(ts)) AS tmin, max(epoch_us(ts)) AS tmax
               FROM e GROUP BY 1),
         iv AS (SELECT itype,
                  tmin + (tmax - tmin) // 10 AS lo_us,
                  tmin + ((tmax - tmin) * 2) // 5 AS hi_us
                FROM b)
       SELECT itype, count(*) AS n_events,
              CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
                AS sum_value
       FROM e JOIN iv ON epoch_us(e.ts) BETWEEN iv.lo_us AND iv.hi_us
       GROUP BY itype ORDER BY itype""",

    "j23_overlap_join" -> s"""$EV,
         sn AS (SELECT user_id, ts,
                  SUM(is_new) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) - 1
                    AS session_idx
                FROM (SELECT *, CASE WHEN lag(ts) OVER (
                          PARTITION BY user_id ORDER BY ts, event_id)
                          IS NULL
                       OR ts > lag(ts) OVER (
                          PARTITION BY user_id ORDER BY ts, event_id)
                          + INTERVAL 30 MINUTE
                       THEN 1 ELSE 0 END AS is_new FROM e)),
         sess AS (SELECT user_id, session_idx,
                    min(epoch_us(ts)) AS s_lo, max(epoch_us(ts)) AS s_hi
                  FROM sn GROUP BY 1, 2),
         b AS (SELECT event_type AS itype,
                 min(epoch_us(ts)) AS tmin, max(epoch_us(ts)) AS tmax
               FROM e GROUP BY 1),
         iv AS (SELECT itype,
                  tmin + (tmax - tmin) // 10 AS lo_us,
                  tmin + ((tmax - tmin) * 2) // 5 AS hi_us
                FROM b)
       SELECT itype, count(*) AS n_sessions,
              count(DISTINCT user_id) AS n_users
       FROM sess JOIN iv ON s_lo <= hi_us AND lo_us <= s_hi
       GROUP BY itype ORDER BY itype""",

    "j18_semi_join" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
              CAST(o_orderdate AS TIMESTAMP) AS o_orderdate
         FROM orders
         WHERE o_orderkey IN (
           SELECT l_orderkey FROM lineitem
           GROUP BY 1 HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 150.0)
         ORDER BY o_orderkey""",

    "j19_anti_join" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal
         FROM customer
         WHERE c_custkey NOT IN (
           SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)
         ORDER BY c_custkey""",

    "g12_event_gaps" -> s"""$EV
         SELECT event_id, user_id, ts,
              epoch_us(ts) - lag(epoch_us(ts), 1) OVER w AS gap_us,
              CAST(row_number() OVER w AS INT) AS user_seq
         FROM e
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         ORDER BY event_id""",

    "j1_join_agg" ->
      """SELECT o_orderpriority,
              CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
              CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
              count(*) AS n_items
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY 1, 2 ORDER BY 1, 2"""
  )
}
