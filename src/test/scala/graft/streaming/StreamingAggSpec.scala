package graft.streaming

import graft.SparkSpec
import graft.agg.{AggFn, AggSpec, SegmentAgg}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

final case class Ev(t: Timestamp, v: Double, rid: Long)
final case class KEv(k: String, t: Timestamp, v: Double, rid: Long)

/** Structured-Streaming AggStream: chunked streaming ingestion (with a
  * query restart from checkpoint mid-stream) must converge to the
  * one-shot batch aggregation — T2/T3 semantics carried natively by the
  * state store + checkpoint.
  */
class StreamingAggSpec extends SparkSpec {
  import spark.implicits._

  val specs = Seq(
    AggSpec("first_v", "v", AggFn.First), AggSpec("last_v", "v", AggFn.Last),
    AggSpec("min_v", "v", AggFn.Min), AggSpec("max_v", "v", AggFn.Max),
    AggSpec("sum_v", "v", AggFn.Sum))

  def mkEvents(n: Int): Seq[Ev] = (0 until n).map { i =>
    Ev(new Timestamp(1700000000000L + i * 50000L), i * 1.0 + (i % 7), i.toLong)
  }

  test("streamed chunks with mid-stream restart equal the batch aggregate") {
    val dir = tmpDir("streamagg")
    val target = s"$dir/out"; val ckpt = s"$dir/ckpt"
    val events = mkEvents(200)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // phase 1: two chunks, then stop
    val m1 = MemoryStream[Ev]
    m1.addData(events.slice(0, 70))
    m1.addData(events.slice(70, 120))
    val q1 = StreamingAgg.run(m1.toDF(), "t", "rid", "10 minutes", specs,
      target, ckpt)
    q1.awaitTermination()

    // phase 2: NEW query, same checkpoint, remaining data (restart path).
    // The source must re-present the original blocks — the checkpoint's
    // committed offsets skip them, exactly like a replayable log source.
    val m2 = MemoryStream[Ev]
    m2.addData(events.slice(0, 70))
    m2.addData(events.slice(70, 120))
    m2.addData(events.slice(120, 200))
    val q2 = StreamingAgg.run(m2.toDF(), "t", "rid", "10 minutes", specs,
      target, ckpt)
    q2.awaitTermination()

    // normalize bin to NTZ on BOTH sides: timeBin preserves its input's
    // timestamp type since the zone-free rewrite (ADVICE r2), so the
    // batch side is LTZ here too — same instants under UTC
    val got = StreamingAgg.results(spark, target, specs)
      .withColumn("bin", col("bin").cast("timestamp_ntz"))
      .orderBy("bin").collect().toSeq
    val batch = SegmentAgg.aggregate(events.toDF(),
      SegmentAgg.timeBin(col("t"), "10 minutes"), specs, col("rid"))
      .withColumn("bin", col("bin").cast("timestamp_ntz"))
      .orderBy("bin").collect().toSeq
    assert(got == batch)
  }

  test("streamed snapshots with mid-stream restart equal one-shot snapshots") {
    val dir = tmpDir("streamsnap")
    val target = s"$dir/out"; val ckpt = s"$dir/ckpt"
    val events = mkEvents(200)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val m1 = MemoryStream[Ev]
    m1.addData(events.slice(0, 90))
    val q1 = StreamingAgg.runSnapshots(m1.toDF(), "t", "rid",
      "30 minutes", "10 minutes", specs, target, ckpt)
    q1.awaitTermination()

    val m2 = MemoryStream[Ev]
    m2.addData(events.slice(0, 90))
    m2.addData(events.slice(90, 200))
    val q2 = StreamingAgg.runSnapshots(m2.toDF(), "t", "rid",
      "30 minutes", "10 minutes", specs, target, ckpt)
    q2.awaitTermination()

    val got = StreamingAgg.resultsSnapshots(spark, target, specs)
      .withColumn("bin", col("bin").cast("timestamp_ntz"))
      .withColumn("snap", col("snap").cast("timestamp_ntz"))
      .orderBy("bin", "snap").collect().toSeq
    val batch = SegmentAgg.snapshots(events.toDF(),
      SegmentAgg.timeBin(col("t"), "30 minutes"),
      SegmentAgg.timeBin(col("t"), "10 minutes"), specs, col("rid"))
      .withColumn("bin", col("bin").cast("timestamp_ntz"))
      .withColumn("snap", col("snap").cast("timestamp_ntz"))
      .orderBy("bin", "snap").collect().toSeq
    assert(got == batch)
  }

  test("streamed count bins: chunking-invariant, restart-safe") {
    val events = mkEvents(200)
    // reference: bins of 30 over (t, rid) order, five kernels + label
    def expected: Seq[(Long, Long, Long, Double, Double, Double, Double,
        Double)] =
      events.sortBy(e => (e.t.getTime, e.rid)).zipWithIndex
        .groupBy(_._2 / 30).toSeq.sortBy(_._1).map { case (bin, rows) =>
          val vs = rows.map(_._1)
          (bin.toLong, vs.map(_.t.getTime).min, vs.size.toLong,
            vs.minBy(_.rid).v, vs.maxBy(_.rid).v,
            vs.map(_.v).min, vs.map(_.v).max,
            vs.map(e => BigDecimal(e.v).setScale(6,
              BigDecimal.RoundingMode.HALF_UP)).sum.toDouble)
        }
    def run(dir: String, slices: Seq[Seq[Ev]], preRestart: Int): Unit = {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext =
        spark.sqlContext
      val m1 = MemoryStream[Ev]
      slices.take(preRestart).foreach(s => m1.addData(s))
      StreamingXRows.run(m1.toDF(), "t", "rid", "v", 30L,
        s"$dir/out", s"$dir/ckpt").awaitTermination()
      // restart: a NEW query on the same checkpoint; the source
      // re-presents every block, committed offsets skip the old ones
      val m2 = MemoryStream[Ev]
      slices.foreach(s => m2.addData(s))
      StreamingXRows.run(m2.toDF(), "t", "rid", "v", 30L,
        s"$dir/out", s"$dir/ckpt").awaitTermination()
    }
    def read(dir: String) = StreamingXRows.results(spark, s"$dir/out")
      .orderBy("bin")
      .select(col("bin"),
        (unix_micros(col("bin_label")) / 1000).cast("long"), col("n_rows"),
        col("first_v"), col("last_v"), col("min_v"), col("max_v"),
        col("sum_v"))
      .as[(Long, Long, Long, Double, Double, Double, Double, Double)]
      .collect().toSeq
    // chunking A: bin-aligned-ish blocks; restart after the first
    val dirA = tmpDir("sxrA")
    run(dirA, Seq(events.slice(0, 60), events.slice(60, 145),
      events.slice(145, 200)), 1)
    // chunking B: mid-bin splits everywhere; restart after two
    val dirB = tmpDir("sxrB")
    run(dirB, Seq(events.slice(0, 7), events.slice(7, 101),
      events.slice(101, 163), events.slice(163, 200)), 2)
    assert(read(dirA) == expected)
    assert(read(dirB) == expected)
  }

  test("per-key streamed count bins equal per-key one-shot binning") {
    // 3 keys interleaved in time: each key's ordinal must advance
    // independently across micro-batch boundaries
    val events = (0 until 180).map { i =>
      KEv(s"k${i % 3}", new Timestamp(1700000000000L + i * 50000L),
        i * 1.0 + (i % 5), i.toLong)
    }
    def expected: Seq[(String, Long, Long, Double, Double, Double)] =
      events.groupBy(_.k).toSeq.flatMap { case (k, evs) =>
        evs.sortBy(e => (e.t.getTime, e.rid)).zipWithIndex
          .groupBy(_._2 / 25).toSeq.map { case (bin, rows) =>
            val vs = rows.map(_._1)
            (k, bin.toLong, vs.size.toLong, vs.minBy(_.rid).v,
              vs.maxBy(_.rid).v,
              vs.map(e => BigDecimal(e.v).setScale(6,
                BigDecimal.RoundingMode.HALF_UP)).sum.toDouble)
          }
      }.sortBy(r => (r._1, r._2))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmpDir("sxrK")
    // mid-bin splits for every key + a restart after the first block
    val m1 = MemoryStream[KEv]
    m1.addData(events.slice(0, 40))
    StreamingXRows.runKeyed(m1.toDF(), "k", "t", "rid", "v", 25L,
      s"$dir/out", s"$dir/ckpt").awaitTermination()
    val m2 = MemoryStream[KEv]
    m2.addData(events.slice(0, 40))
    m2.addData(events.slice(40, 110))
    m2.addData(events.slice(110, 180))
    StreamingXRows.runKeyed(m2.toDF(), "k", "t", "rid", "v", 25L,
      s"$dir/out", s"$dir/ckpt").awaitTermination()
    val got = StreamingXRows.results(spark, s"$dir/out")
      .orderBy("key", "bin")
      .select(col("key"), col("bin"), col("n_rows"), col("first_v"),
        col("last_v"), col("sum_v"))
      .as[(String, Long, Long, Double, Double, Double)]
      .collect().toSeq
    assert(got == expected)
  }

  test("restart across a state-version bump fails with the named " +
      "remedy, not reinterpreted state") {
    val events = mkEvents(60)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmpDir("sxrVer")
    // a query stamps its checkpoint with the CURRENT version...
    val m1 = MemoryStream[Ev]
    m1.addData(events.slice(0, 30))
    StreamingXRows.run(m1.toDF(), "t", "rid", "v", 10L,
      s"$dir/out", s"$dir/ckpt").awaitTermination()
    // ...then code with a bumped semantic version (simulated via the
    // injection hook) restarts over the same checkpoint: the encoder
    // shape is identical, so Spark's own schema check passes — only
    // the version field can refuse the reinterpretation
    val m2 = MemoryStream[Ev]
    m2.addData(events.slice(0, 30))
    m2.addData(events.slice(30, 60))
    val e = intercept[org.apache.spark.sql.streaming
        .StreamingQueryException] {
      StreamingXRows.run(m2.toDF(), "t", "rid", "v", 10L,
        s"$dir/out", s"$dir/ckpt",
        stateVersion = StreamingXRows.StateVersion + 1)
        .awaitTermination()
    }
    def rootMessages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ rootMessages(x.getCause))
    assert(rootMessages(e).exists(m => m.contains("state version") &&
      m.contains("FRESH checkpoint")), s"wrong failure: ${rootMessages(e)}")
  }

  test("count bins fail fast on out-of-order cross-batch arrivals") {
    val events = mkEvents(60)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmpDir("sxrOoo")
    // batch 1: the LATER half; batch 2: the earlier half — ordinals
    // already past it, so convergence is impossible and the query
    // must die with the contract named (strictOrder default)
    val m = MemoryStream[Ev]
    m.addData(events.slice(30, 60))
    StreamingXRows.run(m.toDF(), "t", "rid", "v", 10L,
      s"$dir/out", s"$dir/ckpt").awaitTermination()
    val m2 = MemoryStream[Ev]
    m2.addData(events.slice(30, 60))
    m2.addData(events.slice(0, 30))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      StreamingXRows.run(m2.toDF(), "t", "rid", "v", 10L,
        s"$dir/out", s"$dir/ckpt").awaitTermination()
    }
    def rootMessages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ rootMessages(x.getCause))
    assert(rootMessages(e).exists(_.contains("out of")),
      s"wrong failure: ${rootMessages(e)}")
    // strictOrder=false: same replay proceeds (counted, not fatal)
    val dir2 = tmpDir("sxrOoo2")
    val m3 = MemoryStream[Ev]
    m3.addData(events.slice(30, 60))
    StreamingXRows.run(m3.toDF(), "t", "rid", "v", 10L,
      s"$dir2/out", s"$dir2/ckpt", strictOrder = false).awaitTermination()
    val m4 = MemoryStream[Ev]
    m4.addData(events.slice(30, 60))
    m4.addData(events.slice(0, 30))
    StreamingXRows.run(m4.toDF(), "t", "rid", "v", 10L,
      s"$dir2/out", s"$dir2/ckpt", strictOrder = false).awaitTermination()
    assert(StreamingXRows.results(spark, s"$dir2/out")
      .agg(sum("n_rows")).as[Long].head() == 60L)
  }
}
