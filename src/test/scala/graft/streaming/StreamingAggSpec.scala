package graft.streaming

import graft.SparkSpec
import graft.agg.{AggFn, AggSpec, SegmentAgg}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

final case class Ev(t: Timestamp, v: Double, rid: Long)

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
}
