package graft.sources

import graft.SparkSpec
import graft.store.OrderedDataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

final case class SinkRow(seq: Long, v: Double)

/** The store as a native Structured Streaming SINK
  * (`writeStream.format("graft")`): ordered append per micro-batch,
  * exactly-once via the sidecar-stamped epoch id (replays skipped),
  * checkpoint restart, and the mode/partition guards.
  */
class GraftSinkSpec extends SparkSpec {
  import spark.implicits._

  private def rows(from: Int, until: Int): Seq[SinkRow] =
    (from until until).map(i => SinkRow(i.toLong, i * 1.5))

  test("micro-batches append in order; stamp advances with each epoch") {
    val base = tmpDir("gsink-basic")
    val dir = s"$base/ds"; val ckpt = s"$base/ckpt"
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val m = MemoryStream[SinkRow]
    m.addData(rows(0, 100))
    m.addData(rows(100, 250))
    val q = m.toDF().writeStream.format("graft")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .option("ordered_on", "seq")
      .option("target_rows", "100")
      .start(dir)
    q.awaitTermination()
    val ds = new OrderedDataset(spark, dir)
    assert(ds.df.count() === 250)
    assert(ds.df.agg(min("seq"), max("seq")).as[(Long, Long)].head()
      === ((0L, 249L)))
    // the epoch stamp rode the commit
    assert(ds.kv.contains("graft.sink.default"))
    val stamped = ds.kv("graft.sink.default").toLong
    assert(stamped >= 0L)

    // restart with the SAME checkpoint: replayed blocks are skipped by
    // the source's committed offsets; only new data lands
    val m2 = MemoryStream[SinkRow]
    m2.addData(rows(0, 100))
    m2.addData(rows(100, 250))
    m2.addData(rows(250, 300))
    val q2 = m2.toDF().writeStream.format("graft")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .option("ordered_on", "seq")
      .option("target_rows", "100")
      .start(dir)
    q2.awaitTermination()
    assert(ds.df.count() === 300)
    assert(ds.kv("graft.sink.default").toLong > stamped)
  }

  test("a replayed epoch id is skipped (crash between commit and ckpt)") {
    val base = tmpDir("gsink-replay")
    val dir = s"$base/ds"
    val sink = new GraftSink(spark, dir,
      Map("path" -> dir, "ordered_on" -> "seq", "target_rows" -> "100"))
    val b0 = rows(0, 100).toDF()
    sink.addBatch(0L, b0)
    val ds = new OrderedDataset(spark, dir)
    assert(ds.df.count() === 100)
    val gen = ds.meta.generation
    // the failure mode: data committed, checkpoint not yet advanced →
    // the engine re-delivers the SAME epoch id on restart
    sink.addBatch(0L, b0)
    assert(ds.df.count() === 100) // no duplicate rows
    assert(ds.meta.generation === gen) // no commit happened at all
    sink.addBatch(1L, rows(100, 150).toDF())
    assert(ds.df.count() === 150)
  }

  test("independent queries need distinct sink_ids") {
    val base = tmpDir("gsink-two")
    val dir = s"$base/ds"
    val a = new GraftSink(spark, dir,
      Map("path" -> dir, "ordered_on" -> "seq", "target_rows" -> "100",
        "sink_id" -> "qa"))
    val b = new GraftSink(spark, dir,
      Map("path" -> dir, "ordered_on" -> "seq", "target_rows" -> "100",
        "sink_id" -> "qb"))
    a.addBatch(0L, rows(0, 50).toDF())
    b.addBatch(0L, rows(50, 100).toDF()) // same epoch, different query
    val ds = new OrderedDataset(spark, dir)
    assert(ds.df.count() === 100)
    assert(ds.kv("graft.sink.qa") === "0" && ds.kv("graft.sink.qb") === "0")
  }

  test("update mode + duplicates_on: streamed agg converges via upsert") {
    val base = tmpDir("gsink-update")
    val dir = s"$base/ds"; val ckpt = s"$base/ckpt"
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val m = MemoryStream[SinkRow]
    // two batches touching the SAME key groups: update mode re-emits
    // the full updated aggregate, the sink keep-last-upserts per key
    m.addData(rows(0, 100))
    m.addData(rows(100, 200))
    val q = m.toDF()
      .groupBy((col("seq") % 10).as("k"))
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .writeStream.format("graft")
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .option("ordered_on", "k")
      .option("duplicates_on", "k")
      .option("target_rows", "100")
      .start(dir)
    q.awaitTermination()
    val ds = new OrderedDataset(spark, dir)
    val got = ds.df.orderBy("k")
      .select("k", "s", "n").as[(Long, Double, Long)].collect().toSeq
    val exp = rows(0, 200).groupBy(_.seq % 10).toSeq.sortBy(_._1)
      .map { case (k, rs) => (k, rs.map(_.v).sum, rs.size.toLong) }
    assert(got === exp)
  }

  test("update mode and partitionBy are rejected") {
    val base = tmpDir("gsink-guards")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val m = MemoryStream[SinkRow]
    m.addData(rows(0, 10))
    val e = intercept[Exception] {
      val q = m.toDF().groupBy("seq").agg(sum("v").as("s"))
        .writeStream.format("graft")
        .outputMode("update")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$base/ckpt1")
        .option("ordered_on", "seq")
        .start(s"$base/ds1")
      q.awaitTermination()
    }
    assert(e.getMessage.contains("without duplicates_on"))
    val e2 = intercept[Exception] {
      val q = m.toDF().writeStream.format("graft")
        .outputMode("append")
        .partitionBy("seq")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$base/ckpt2")
        .option("ordered_on", "seq")
        .start(s"$base/ds2")
      q.awaitTermination()
    }
    assert(e2.getMessage.contains("partitionBy"))
  }
}
