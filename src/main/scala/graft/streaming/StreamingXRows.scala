package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StreamingQuery, Trigger}
import graft.store.{NRows, OrderedDataset, RowGroupTarget, WriteOpts}

/** Native Structured Streaming COUNT-based bins (the reference's
  * `by_x_rows` in streaming form — ref segmentby.py:712-1028 for the
  * batch semantics; the reference itself has no streaming engine).
  * Completes the T-matrix's native-streaming column next to
  * [[StreamingAgg]]'s time bins and snapshots: `t7_aggstream_xrows`
  * is the batch-incremental path, this is the state-store path.
  *
  * Count bins are defined by the GLOBAL row ordinal in seed order, so
  * the running ordinal and the open (tail) bin's partial aggregate
  * are carried in `flatMapGroupsWithState` state under ONE group key:
  * a deliberate single-task stage, because global count-binning is
  * sequential by definition — the same inherent bound as the
  * reference's single-process carry (`chunk_res`) and our
  * batch-incremental `AggStream` xRows restart state. This is the
  * one operator family where "scale out" is semantic nonsense; at
  * 100 TB you shard count bins BY KEY (per-key `StreamKeyCfg.xRows`
  * fan-out) or bin by time. Each micro-batch is sorted in memory
  * inside the group function (bounded by micro-batch size, not
  * stream size).
  *
  * Emission is update-shaped: every bin a batch touches is emitted
  * with its FULL current aggregate (completed bins once more on the
  * batch that closes them, the open bin as a snapshot every batch);
  * the keep-last upsert on the bin ordinal converges the stored
  * dataset to the one-shot binning regardless of chunking — the same
  * convergence contract as [[StreamingAgg.run]].
  *
  * Five-kernel aggregate over one value column (first/last by the tie
  * column, min/max, decimal-exact sum carried as a string in state so
  * a checkpoint round-trip never loses precision).
  */
object StreamingXRows {

  final case class XIn(tie: Long, tsMicros: Long, value: Double)
  final case class OpenBin(bin: Long, labelMicros: Long, n: Long,
      firstTie: Long, firstV: Double, lastTie: Long, lastV: Double,
      minV: Double, maxV: Double, sumStr: String)
  final case class XState(rowsSoFar: Long, open: Option[OpenBin])
  final case class XOut(bin: Long, label_micros: Long, n_rows: Long,
      first_v: Double, last_v: Double, min_v: Double, max_v: Double,
      sum_str: String)

  private def dec(v: Double): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(v).setScale(6,
      java.math.RoundingMode.HALF_UP)

  def run(seed: DataFrame, orderedOn: String, tieCol: String,
      valueCol: String, xRows: Long, targetDir: String,
      checkpointDir: String, target: RowGroupTarget = NRows(6345000L),
      /** The group function sorts each micro-batch in ONE task's
        * memory; this fails fast with the remedies named instead of a
        * silent executor OOM when a source hands over an oversized
        * batch (e.g. a giant graft commit — rate-limit with
        * max_generations_per_trigger, or commit smaller increments). */
      maxBatchRows: Int = 20000000): StreamingQuery = {
    require(xRows > 0, s"xRows must be positive, got $xRows")
    require(maxBatchRows > 0,
      s"maxBatchRows must be positive, got $maxBatchRows")
    val spark = seed.sparkSession
    import spark.implicits._
    val typed = seed.select(
      col(tieCol).cast("long").as("tie"),
      // explicit LTZ: a session with spark.sql.timestampType=NTZ would
      // otherwise make the bare "timestamp" cast NTZ, which
      // unix_micros rejects (session TZ is UTC, so the instant is the
      // same either way)
      unix_micros(col(orderedOn).cast("timestamp_ltz")).as("tsMicros"),
      col(valueCol).cast("double").as("value")).as[XIn]

    val out = typed.groupByKey(_ => 0)
      .flatMapGroupsWithState[XState, XOut](OutputMode.Update,
        GroupStateTimeout.NoTimeout) { (_, it, state) =>
        val rows = it.take(maxBatchRows + 1).toArray
        require(rows.length <= maxBatchRows,
          s"micro-batch exceeds maxBatchRows=$maxBatchRows for the " +
            "in-memory count-bin sort — rate-limit the source " +
            "(max_generations_per_trigger) or raise the bound")
        java.util.Arrays.sort(rows,
          Ordering.by((r: XIn) => (r.tsMicros, r.tie)))
        if (rows.isEmpty) Iterator.empty
        else {
          val st0 = state.getOption.getOrElse(XState(0L, None))
          var rowsSoFar = st0.rowsSoFar
          var open = st0.open
          val emitted = scala.collection.mutable.ArrayBuffer.empty[XOut]
          def snap(o: OpenBin): XOut =
            XOut(o.bin, o.labelMicros, o.n, o.firstV, o.lastV,
              o.minV, o.maxV, o.sumStr)
          def fresh(bin: Long, r: XIn): OpenBin =
            OpenBin(bin, r.tsMicros, 1L, r.tie, r.value, r.tie, r.value,
              r.value, r.value, dec(r.value).toPlainString)
          rows.foreach { r =>
            val bin = rowsSoFar / xRows
            open match {
              case Some(o) if o.bin == bin =>
                open = Some(o.copy(
                  labelMicros = math.min(o.labelMicros, r.tsMicros),
                  n = o.n + 1,
                  firstTie = math.min(o.firstTie, r.tie),
                  firstV = if (r.tie < o.firstTie) r.value else o.firstV,
                  lastTie = math.max(o.lastTie, r.tie),
                  lastV = if (r.tie > o.lastTie) r.value else o.lastV,
                  minV = math.min(o.minV, r.value),
                  maxV = math.max(o.maxV, r.value),
                  sumStr = new java.math.BigDecimal(o.sumStr)
                    .add(dec(r.value)).toPlainString))
              case Some(o) => // the previous bin just completed
                emitted += snap(o)
                open = Some(fresh(bin, r))
              case None => open = Some(fresh(bin, r))
            }
            rowsSoFar += 1
          }
          open.foreach(o => emitted += snap(o)) // open-bin update
          state.update(XState(rowsSoFar, open))
          emitted.iterator
        }
      }

    out.toDF()
      .select(col("bin"),
        timestamp_micros(col("label_micros")).as("bin_label"),
        col("n_rows"), col("first_v"), col("last_v"),
        col("min_v"), col("max_v"),
        col("sum_str").cast("decimal(38,6)").cast("double").as("sum_v"))
      .writeStream
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

  /** Batch view of the streamed count bins. */
  def results(spark: SparkSession, targetDir: String): DataFrame =
    new OrderedDataset(spark, targetDir).df
}
