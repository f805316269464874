package graft.agg

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.time.LocalDateTime

class SegmentAggSpec extends SparkSpec {
  import spark.implicits._

  def ts(s: String): LocalDateTime = LocalDateTime.parse(s)

  val df = Seq(
    (ts("2024-01-01T00:00:00"), 1.0, 0L),
    (ts("2024-01-01T00:04:59"), 2.0, 1L),
    (ts("2024-01-01T00:05:00"), 3.0, 2L), // exactly on a 5-min edge
    (ts("2024-01-01T00:09:59"), 4.0, 3L),
    (ts("2024-01-01T00:10:00"), 5.0, 4L))
    .toDF("t", "v", "rid")

  test("floor_ts/ceil_ts: boundary identity, fixed and calendar freqs") {
    import graft.functions.TimeFns._
    val rows = df.select(
      floor_ts($"t", "5 minutes").as("fl"),
      ceil_ts($"t", "5 minutes").as("ce"),
      floor_ts($"t", "month").as("flm"),
      ceil_ts($"t", "month").as("cem"))
      .as[(LocalDateTime, LocalDateTime, LocalDateTime, LocalDateTime)]
      .collect().toSeq
    assert(rows.map(_._1.getMinute) == Seq(0, 0, 5, 5, 10))
    // ceil: identity on the 0/5/10-minute edges, next edge otherwise
    assert(rows.map(_._2.getMinute) == Seq(0, 5, 5, 10, 10))
    assert(rows.map(_._3).forall(_ == ts("2024-01-01T00:00:00")))
    // all five values are past the Jan-1 boundary except the first
    assert(rows.head._4 == ts("2024-01-01T00:00:00"))
    assert(rows.tail.map(_._4).forall(_ == ts("2024-02-01T00:00:00")))
  }

  test("fixed-freq bins are session-timezone independent (ADVICE r2)") {
    import graft.functions.TimeFns._
    def run(): Seq[Seq[LocalDateTime]] =
      df.select(
        floor_ts($"t", "1 hour").as("fl"),
        ceil_ts($"t", "1 hour").as("ce"),
        SegmentAgg.timeBin($"t", "5 minutes", "right", "right").as("b"))
        .as[(LocalDateTime, LocalDateTime, LocalDateTime)]
        .collect().toSeq.map(t => Seq(t._1, t._2, t._3))
    val utc = run()
    val tzKey = "spark.sql.session.timeZone"
    val saved = spark.conf.get(tzKey)
    // +05:30: a half-hour offset shifts any epoch-based hourly alignment
    try { spark.conf.set(tzKey, "Asia/Kolkata"); assert(run() == utc) }
    finally spark.conf.set(tzKey, saved)
  }

  test("BinBy policies: ByTime/ByEdges match raw fns; ByExpr is the UDF") {
    val byTime = BinBy.ByTime("5 minutes")
    assert(df.select(byTime($"t")).collect().toSeq ==
      df.select(SegmentAgg.timeBin($"t", "5 minutes")).collect().toSeq)
    val edges = Seq(ts("2024-01-01T00:00:00"), ts("2024-01-01T00:10:00"))
    val byEdges = BinBy.ByEdges(edges)
    assert(df.select(byEdges($"t")).collect().toSeq ==
      df.select(SegmentAgg.edgeBin($"t", edges)).collect().toSeq)
    // user-defined segmentation through the shared aggregate entry
    val byParity = BinBy.ByExpr(o => pmod(minute(o), lit(2)))
    val out = SegmentAgg.aggregate(df, byParity, "t",
      Seq(AggSpec("sum_v", "v", AggFn.Sum)), $"rid")
      .orderBy("bin").as[(Int, Double)].collect().toSeq
    assert(out == Seq((0, 8.0), (1, 7.0))) // even minutes 0,4,10; odd 5,9
  }

  test("snapshotsWithSpine forwards running values; nulls before data") {
    // one 10-min bin, 2-min snaps; data only at minutes 2-3 and 9
    val ev = Seq(
      (ts("2024-01-01T00:02:00"), 10.0, 0L),
      (ts("2024-01-01T00:03:00"), 20.0, 1L),
      (ts("2024-01-01T00:09:00"), 5.0, 2L))
      .toDF("t", "v", "rid")
    val out = SegmentAgg.snapshotsWithSpine(ev,
        SegmentAgg.timeBin($"t", "10 minutes"),
        SegmentAgg.timeBin($"t", "2 minutes"),
        Seq(AggSpec("sum_v", "v", AggFn.Sum),
          AggSpec("min_v", "v", AggFn.Min)),
        $"rid", "10 MINUTES", "2 MINUTES")
      .orderBy("snap")
      .select("sum_v", "min_v")
      .collect().toSeq
    assert(out.size == 5) // full grid despite 2 non-empty cells
    assert(out(0).isNullAt(0)) // snap 00:00: before first data
    assert(out(1).getDouble(0) == 30.0) // 00:02-04: both rows
    assert(out(2).getDouble(0) == 30.0) // 00:04: forwarded
    assert(out(3).getDouble(0) == 30.0) // 00:06: forwarded
    assert(out(4).getDouble(0) == 35.0 && out(4).getDouble(1) == 5.0)
  }

  test("timeBin closed/label semantics on exact edges") {
    def bins(closed: String, label: String): Seq[LocalDateTime] =
      df.select(SegmentAgg.timeBin($"t", "5 minutes", closed, label))
        .as[LocalDateTime].collect().toSeq
    // left-closed: edge value opens a NEW bin
    assert(bins("left", "left").map(_.getMinute) == Seq(0, 0, 5, 5, 10))
    assert(bins("left", "right").map(_.getMinute) == Seq(5, 5, 10, 10, 15))
    // right-closed: edge value belongs to the bin ENDING there
    assert(bins("right", "right").map(_.getMinute) == Seq(0, 5, 5, 10, 10))
    assert(bins("right", "left").map(_.getMinute) ==
      Seq(55, 0, 0, 5, 5)) // first bin starts at 23:55 of prev day
  }

  test("timeBin matches window() alignment for fixed durations") {
    val a = df.select(SegmentAgg.timeBin($"t", "5 minutes")
      .as("bin")).as[LocalDateTime].collect().toSeq
    val b = df.select(window($"t", "5 minutes").getField("start")
      .cast("timestamp_ntz").as("bin")).as[LocalDateTime].collect().toSeq
    assert(a == b)
  }

  test("edgeBin assigns greatest edge <= value, null below first edge") {
    val edges = Seq(ts("2024-01-01T00:03:00"), ts("2024-01-01T00:08:00"))
    val out = df.select(SegmentAgg.edgeBin($"t", edges).as("bin"))
      .collect().map(r => Option(r.get(0)))
    assert(out(0).isEmpty)                       // before first edge
    assert(out(1).contains(ts("2024-01-01T00:03:00")))
    assert(out(2).contains(ts("2024-01-01T00:03:00")))
    assert(out(3).contains(ts("2024-01-01T00:08:00")))
    assert(out(4).contains(ts("2024-01-01T00:08:00")))
  }

  test("edgeBin right-closed works on numeric edges (no interval math)") {
    val df = Seq(0L, 10L, 11L, 20L, 25L).toDF("v")
    val out = df.select(
        SegmentAgg.edgeBin($"v", Seq(10L, 20L), closed = "right").as("bin"))
      .collect().map(r => Option(r.get(0)))
    // right-closed: label = greatest edge STRICTLY below v
    assert(out(0).isEmpty)            // 0  <= first edge
    assert(out(1).isEmpty)            // 10 == edge -> belongs to (prev,10]
    assert(out(2).contains(10L))      // 11 in (10,20]
    assert(out(3).contains(10L))      // 20 == edge
    assert(out(4).contains(20L))      // 25 beyond last edge
  }

  test("xRowsBins carry continues a partial bin across calls") {
    val binned = SegmentAgg.xRowsBins(df, "t", 2, $"rid", carryIn = 1L)
    val ids = binned.orderBy("t").select("bin_id").as[Long].collect().toSeq
    // global idx 1,2,3,4,5 → /2 → 0,1,1,2,2
    assert(ids == Seq(0L, 1L, 1L, 2L, 2L))
  }

  test("salted aggregation equals direct aggregation on skewed keys") {
    // 90% of rows share one hot key
    val skewed = (0 until 2000).map { i =>
      val key = if (i % 10 == 0) s"k${i % 7}" else "hot"
      (key, i * 1.0, i.toLong)
    }.toDF("k", "v", "rid")
    val specs = Seq(
      AggSpec("f", "v", AggFn.First), AggSpec("l", "v", AggFn.Last),
      AggSpec("mn", "v", AggFn.Min), AggSpec("mx", "v", AggFn.Max),
      AggSpec("s", "v", AggFn.Sum))
    val direct = SegmentAgg.aggregate(skewed, $"k", specs, $"rid")
      .orderBy("bin").collect().toSeq
    val salted = SaltedAgg.aggregate(skewed, $"k", specs, $"rid", 16)
      .orderBy("bin").collect().toSeq
    assert(salted == direct)
  }

  test("aggregateWithSpine materializes empty bins with nulls") {
    val sparse = Seq((ts("2024-01-01T00:00:30"), 1.0, 0L),
      (ts("2024-01-01T00:15:30"), 2.0, 1L)).toDF("t", "v", "rid")
    val out = SegmentAgg.aggregateWithSpine(sparse,
      SegmentAgg.timeBin($"t", "5 minutes"),
      Seq(AggSpec("sum_v", "v", AggFn.Sum)), $"rid", "5 MINUTES")
      .orderBy("bin").collect()
    assert(out.length == 4) // 00:00, 00:05, 00:10, 00:15
    assert(out(1).isNullAt(1) && out(2).isNullAt(1))
    assert(out(0).getDouble(1) == 1.0 && out(3).getDouble(1) == 2.0)
  }
}
