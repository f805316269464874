package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.graftbridge.SparkInternals
import graft.store.OrderedDataset

/** V1 streaming sink writing micro-batches into an ordered dataset
  * through the standard ordered upsert (see
  * [[GraftSource.createSink]] for the exactly-once contract).
  *
  * Exactly-once mechanics: Structured Streaming guarantees epoch ids
  * are replayed VERBATIM after a crash (the checkpoint WAL), so
  * `batchId <= lastCommitted` identifies a replay of work whose data
  * commit already happened; the stamp rides the same sidecar swap as
  * the file list, so "data committed" and "stamp advanced" cannot
  * diverge. The write lock serializes concurrent writers; distinct
  * queries use distinct `sink_id`s (each gets its own stamp key).
  */
final class GraftSink(spark: SparkSession, dir: String,
    parameters: Map[String, String]) extends Sink {

  private val stampKey =
    s"graft.sink.${parameters.getOrElse("sink_id", "default")}"

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val ds = new OrderedDataset(spark, dir)
    val last =
      if (ds.exists) ds.kv.get(stampKey).map(_.trim.toLong) else None
    if (last.exists(batchId <= _)) return // replayed, already committed
    // the sink's frame still references streaming sources — pin it to
    // the already-planned physical RDD before the batch write machinery
    val batch = SparkInternals.batchDataFrame(data)
    if (batch.isEmpty) return // nothing to commit; replay is a no-op
    val opts = GraftSource.writeOpts(parameters)
    ds.write(batch,
      opts.copy(kv = opts.kv + (stampKey -> batchId.toString))): Unit
  }

  override def toString: String = s"GraftSink[$dir]"
}
