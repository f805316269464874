package graft.sources

import graft.SparkSpec
import graft.store.{NRows, OrderedDataset, WriteOpts}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The ordered store as a native streaming source: each committed
  * generation range becomes one micro-batch of inserted rows; restarts
  * resume from checkpointed generation offsets; updates re-insert the
  * new row version; compaction rewrites stream nothing.
  */
class GraftStreamSourceSpec extends SparkSpec {
  import spark.implicits._

  /** foreachBatch collector sink: unlike the memory sink it SUPPORTS
    * checkpoint recovery, which is the restart behavior under test. */
  private val collected =
    new scala.collection.mutable.ArrayBuffer[(Long, Double)]

  private def runOnce(dir: String, ckpt: String,
      opts: Map[String, String] = Map.empty): Unit = {
    var r = spark.readStream.format("graft")
    opts.foreach { case (k, v) => r = r.option(k, v) }
    val q = r.load(dir)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = df.select(col("seq"),
          coalesce(col("v"), lit(0.0))).as[(Long, Double)].collect()
        collected.synchronized { collected ++= rows }: Unit
      }
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("tails commits as micro-batches; restart resumes from offsets") {
    val base = tmpDir("gss")
    val dir = s"$base/ds"; val ckpt = s"$base/ckpt"
    val ds = new OrderedDataset(spark, dir)
    ds.write(spark.range(10).toDF("seq").withColumn("v", lit(1.0)),
      WriteOpts("seq", NRows(100)))

    // batch 1: the initial snapshot
    collected.clear()
    runOnce(dir, ckpt)
    assert(collected.size == 10)

    // two more commits while the stream is down: a pure append and an
    // overlapping append (file rewrite; unchanged rows must not re-emit)
    ds.write(spark.range(10, 18).toDF("seq").withColumn("v", lit(1.0)),
      WriteOpts("seq", NRows(100)))
    ds.write(spark.range(18, 20).toDF("seq").withColumn("v", lit(1.0)),
      WriteOpts("seq", NRows(100)))
    runOnce(dir, ckpt)
    assert(collected.map(_._1).sorted.toSeq == (0L until 20L),
      s"got ${collected.sortBy(_._1)}")

    // an UPDATE commit (keep-last upsert): only the new versions stream
    ds.write(spark.range(5, 8).toDF("seq").withColumn("v", lit(2.0)),
      WriteOpts("seq", NRows(100), duplicatesOn = Some(Seq("seq"))))
    runOnce(dir, ckpt)
    assert(collected.filter(_._2 == 2.0).map(_._1).sorted.toSeq ==
      Seq(5L, 6L, 7L))
    // nothing else re-emitted
    assert(collected.size == 23)

    // a pure compaction (optimize) commits a new generation but emits
    // NOTHING — every row is a rewrite of an identical row
    val before = collected.size
    ds.optimize(NRows(1000)): Unit
    runOnce(dir, ckpt)
    assert(collected.size == before)
  }

  test("starting_generation streams changes since, not the snapshot") {
    val base = tmpDir("gss2")
    val dir = s"$base/ds"; val ckpt = s"$base/ckpt"
    val ds = new OrderedDataset(spark, dir)
    ds.write(spark.range(100).toDF("seq").withColumn("v", lit(1.0)),
      WriteOpts("seq", NRows(100)))
    val g1 = ds.generation
    ds.write(spark.range(100, 105).toDF("seq").withColumn("v", lit(1.0)),
      WriteOpts("seq", NRows(100)))

    collected.clear()
    runOnce(dir, ckpt, Map("starting_generation" -> g1.toString))
    assert(collected.map(_._1).sorted.toSeq == (100L until 105L),
      s"got ${collected.sortBy(_._1)}")
  }

  test("streaming schema comes from the sidecar; missing dataset fails") {
    val base = tmpDir("gss3")
    val err = intercept[IllegalArgumentException] {
      spark.readStream.format("graft").load(s"$base/nope").schema
    }
    assert(err.getMessage.contains("existing dataset"))
  }

  test("max_generations_per_trigger bounds each catch-up batch") {
    val base = tmpDir("gss4")
    val dir = s"$base/ds"; val ckpt = s"$base/ckpt"
    val ds = new OrderedDataset(spark, dir)
    // 4 commits while no stream is running
    (0 until 4).foreach { i =>
      ds.write(spark.range(i * 10L, (i + 1) * 10L).toDF("seq")
          .withColumn("v", lit(1.0)),
        WriteOpts("seq", NRows(100)))
    }
    // a rate-limited AvailableNow run must catch up in MULTIPLE
    // batches (one generation each after the initial snapshot) and
    // still deliver every row exactly once
    collected.clear()
    val batchIds = new scala.collection.mutable.ArrayBuffer[Long]
    val q = spark.readStream.format("graft")
      .option("max_generations_per_trigger", "1")
      .load(dir)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        batchIds.synchronized { batchIds += id }: Unit
        val rows = df.select(col("seq"), col("v")).as[(Long, Double)]
          .collect()
        collected.synchronized { collected ++= rows }: Unit
      }
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(collected.map(_._1).sorted.toSeq == (0L until 40L),
      s"got ${collected.sortBy(_._1)}")
    // first batch = uncapped snapshot at the then-live generation would
    // swallow everything; the cap keeps it at the FIRST generation and
    // the remaining three arrive one generation per batch
    assert(batchIds.size >= 3, s"expected multiple batches, got $batchIds")
  }
}
