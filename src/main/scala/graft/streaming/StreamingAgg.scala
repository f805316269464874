package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.agg.{AggFn, AggSpec}
import graft.store.{NRows, OrderedDataset, RowGroupTarget, WriteOpts}

/** Structured-Streaming form of the streamed segment aggregation
  * (SURVEY §7.2 step 8): the reference's AggStream semantics expressed
  * natively — event-time tumbling windows, update-mode emission of
  * changed bins per micro-batch, and `foreachBatch` keep-last upsert of
  * those bins into an OrderedDataset. The state store carries the
  * running aggregates (replacing the reference's `chunk_res` carry /
  * our batch-incremental mergeable partials), and the checkpoint
  * replaces the persisted restart index (T2/T3 natively).
  *
  * Output correctness relies on update mode emitting the FULL updated
  * aggregate of every bin touched by a batch — the keep-last upsert on
  * the bin label then makes the stored dataset converge to the one-shot
  * aggregation regardless of how the seed was chunked.
  */
object StreamingAgg {

  /** Aggregate a streaming DataFrame into a store-backed result dataset.
    *
    * @param seed streaming DataFrame (readStream source)
    * @param orderedOn event-time column (timestamp)
    * @param tieCol deterministic within-bin order column for first/last
    * @param freq tumbling window duration, e.g. "1 hour"
    * @param specs the five-kernel agg plan
    * @param targetDir OrderedDataset directory for results
    * @param checkpointDir streaming checkpoint location
    */
  def run(seed: DataFrame, orderedOn: String, tieCol: String, freq: String,
      specs: Seq[AggSpec], targetDir: String, checkpointDir: String,
      target: RowGroupTarget = NRows(6345000L)): StreamingQuery = {
    val spark = seed.sparkSession
    val aggExprs = specs.map { s =>
      val c = col(s.in)
      (s.fn match {
        case AggFn.First => min_by(c, col(tieCol))
        case AggFn.Last  => max_by(c, col(tieCol))
        case AggFn.Min   => min(c)
        case AggFn.Max   => max(c)
        case AggFn.Sum   => sum(c.cast("decimal(38,6)"))
      }).as(s.out)
    }
    // groupBy the window struct itself (watermark propagation requires
    // it); project the start label after the aggregate
    val agg = seed
      .withWatermark(orderedOn, "0 seconds")
      .groupBy(window(col(orderedOn), freq).as("w"))
      .agg(aggExprs.head, aggExprs.tail: _*)
      .select(col("w").getField("start").as("bin") +:
        specs.map(s => col(s.out)): _*)

    agg.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val ds = new OrderedDataset(spark, targetDir)
          ds.write(batch, WriteOpts("bin", target,
            duplicatesOn = Some(Seq("bin"))))
        }
        ()
      }
      .start()
  }

  /** Batch view of the streamed result with decimal sums cast back. */
  def results(spark: SparkSession, targetDir: String, specs: Seq[AggSpec])
      : DataFrame = {
    val ds = new OrderedDataset(spark, targetDir)
    val casts = specs.map { s =>
      if (s.fn == AggFn.Sum) col(s.out).cast("double").as(s.out)
      else col(s.out)
    }
    ds.df.select(col("bin") +: casts: _*)
  }
}
