package graft

import graft.agg.{AggFn, AggSpec, SegmentAgg}
import graft.store._
import org.apache.spark.sql.functions._
import java.time.LocalDateTime

/** The SURVEY §7.3 minimum slice as one narrative: a keyed weather
  * store (ref tutorial.rst:87-99 shape), an ordered write, an
  * overlapping correction upsert with keep-last dedup, a pruned range
  * read, and a tumbling aggregation over the result — the reference's
  * entire semantic core in ~40 lines of user code.
  */
class TutorialSpec extends SparkSpec {
  import spark.implicits._

  case class WeatherKey(country: String, city: String)
  implicit val ord: Ordering[WeatherKey] = Ordering.by(k => (k.country, k.city))
  val weatherIdx: Indexer[WeatherKey] = Indexer.of[WeatherKey](1)(
    k => Seq(Seq(k.country, k.city)))(
    l => l.head match {
      case Seq(co, ci) => Some(WeatherKey(co, ci)); case _ => None })

  test("write, upsert a correction, range-read, aggregate") {
    val store = new Store(spark, tmpDir("weather"), weatherIdx)
    val berlin = WeatherKey("germany", "berlin")
    def t(h: Int, m: Int) = LocalDateTime.of(2024, 3, 1, h, m)

    // 1. initial ordered write: one reading every 10 minutes
    val initial = (0 until 144).map { i =>
      (t(i / 6, (i % 6) * 10), 10.0 + (i % 24) * 0.5, 60L + i % 30)
    }.toDF("timestamp", "temperature", "humidity")
    store.get(berlin).write(initial,
      WriteOpts("timestamp", NRows(50)))
    assert(store.keys.toSeq == Seq(berlin))

    // 2. a correction batch overwrites the 08:00-09:00 readings
    val correction = (48 until 54).map { i =>
      (t(i / 6, (i % 6) * 10), -5.0, 99L)
    }.toDF("timestamp", "temperature", "humidity")
    store.get(berlin).write(correction,
      WriteOpts("timestamp", NRows(50),
        duplicatesOn = Some(Seq("timestamp")), maxNOffTargetRgs = Some(3)))

    val ds = store.get(berlin)
    assert(ds.df.count() == 144) // corrected in place, not appended

    // 3. pruned range read over the corrected window
    val eight = ds.rangeDF(
      Some(OrdVal.fromAny(t(8, 0))), Some(OrdVal.fromAny(t(9, 0))))
    assert(eight.count() == 6)
    assert(eight.agg(max("temperature")).head.getDouble(0) == -5.0)

    // 4. hourly tumbling aggregation over the whole dataset
    val hourly = SegmentAgg.aggregate(ds.orderedDf,
      SegmentAgg.timeBin(col("timestamp"), "1 hour"),
      Seq(AggSpec("t_min", "temperature", AggFn.Min),
        AggSpec("t_max", "temperature", AggFn.Max),
        AggSpec("t_first", "temperature", AggFn.First)),
      col("timestamp"))
      .orderBy("bin").collect()
    assert(hourly.length == 24)
    assert(hourly(8).getDouble(1) == -5.0) // corrected hour
    assert(hourly(9).getDouble(1) > 0)     // untouched hour
  }
}
