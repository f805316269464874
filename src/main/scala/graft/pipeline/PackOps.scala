package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Concat-and-chunk sequence packing — the layout step that turns a
  * filtered corpus into fixed-token-budget training sequences: shard
  * documents deterministically, concatenate each shard in stable id
  * order, and cut the concatenation into `capacity`-token chunks
  * (documents spanning a cut belong to both chunks, exactly like a
  * causal-LM data loader that packs a token stream).
  *
  * The running offset is a prefix sum windowed BY SHARD — there is no
  * global single-partition window anywhere, so the operator scales
  * like any keyed window: one shuffle on the shard id, shards stream
  * independently. Each shard is one training-file worth of data;
  * `shards` should track the corpus size (files of ~100k–1M docs), the
  * same way a real pipeline sizes output files.
  */
object PackOps {

  /** Adds per-doc packing coordinates: `shard` (= id mod shards),
    * `n_tokens`, `start_off` (tokens before this doc within its
    * shard's concatenation), `chunk_first`/`chunk_last` (the capacity-C
    * chunks this doc's tokens land in). Offsets are nonnegative, so
    * floor division is plain integral division.
    */
  def packChunks(df: DataFrame, idCol: String, tokens: Column,
      shards: Int, capacity: Int): DataFrame = {
    require(shards > 0 && capacity > 0,
      s"shards/capacity must be positive, got $shards/$capacity")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    import graft.operators.RangeJoin.floorDiv
    df.withColumn("shard", pmod(col(idCol), lit(shards.toLong)))
      .withColumn("n_tokens", tokens.cast("long"))
      .withColumn("start_off",
        sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("chunk_first", floorDiv(col("start_off"), capacity))
      // a zero-token doc occupies no span; clamp to [first, first] so
      // chunk_last < chunk_first never happens (a raw floorDiv(start-1)
      // yields -1 at shard offset 0, and sequence(first, last) over an
      // inverted range enumerates bogus descending chunks)
      .withColumn("chunk_last",
        greatest(col("chunk_first"),
          floorDiv(col("start_off") + col("n_tokens") - 1, capacity)))
  }
}
