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

  /** The MATERIALIZING half of packing: where [[packChunks]] only
    * assigns coordinates over token COUNTS, this emits the actual
    * fixed-length training sequences from per-document token ARRAYS
    * (e.g. [[graft.functions.Bpe.bpeTokens]]) — concatenate each
    * shard's documents in id order, cut every `seqLen` tokens, carry
    * document boundaries. The last sequence of a shard stays partial
    * (padding is a trainer concern, not a layout one).
    *
    * Scale shape: same per-shard prefix sum as packChunks (no global
    * window); each document then explodes into only the sequences it
    * SPANS, carrying the array SLICE that lands in each — token data
    * crosses the wire once, in compact array form, never as one row
    * per token; the final groupBy(shard, seq_id) reassembles slices in
    * offset order. Output: (shard, seq_id, n_tokens, n_docs,
    * doc_bounds, tokens_digest) — the digest is of the '|'-joined
    * sequence (the hash-comparable stand-in for writing the sequence
    * rows out) and `doc_bounds` is the comma-joined sorted list of
    * WITHIN-SEQUENCE offsets where a document STARTS — the
    * attention-reset positions a packed-causal-LM trainer masks on
    * (a sequence beginning mid-document has no 0 entry: position 0
    * is a continuation, not a reset).
    */
  def packSequences(df: DataFrame, idCol: String, tokens: Column,
      shards: Int, seqLen: Int): DataFrame = {
    require(shards > 0 && seqLen > 0,
      s"shards/seqLen must be positive, got $shards/$seqLen")
    import graft.operators.RangeJoin.floorDiv
    val w = Window.partitionBy(col("shard")).orderBy(col("__id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = df
      .select(col(idCol).cast("long").as("__id"), tokens.as("toks"))
      .withColumn("shard", pmod(col("__id"), lit(shards.toLong)))
      .withColumn("n", size(col("toks")).cast("long"))
      .withColumn("start_off", sum(col("n")).over(w) - col("n"))
      // zero-token docs occupy no span; they contribute 0 to every
      // later offset, so dropping them here changes nothing else
      .filter(col("n") > 0)
    val spans = base
      .withColumn("seq_id", explode(sequence(
        floorDiv(col("start_off"), seqLen),
        floorDiv(col("start_off") + col("n") - 1, seqLen))))
      .withColumn("lo",
        greatest(col("start_off"), col("seq_id") * seqLen))
      .withColumn("hi", least(col("start_off") + col("n") - 1,
        (col("seq_id") + 1) * seqLen - 1))
      .select(col("shard"), col("seq_id"), col("start_off"),
        slice(col("toks"),
          (col("lo") - col("start_off") + 1).cast("int"),
          (col("hi") - col("lo") + 1).cast("int")).as("piece"),
        // a doc STARTS in this sequence iff its global start is the
        // piece's lo; its attention-reset offset is within-sequence
        when(col("lo") === col("start_off"),
          col("start_off") - col("seq_id") * seqLen).as("bnd"))
    spans.groupBy("shard", "seq_id")
      .agg(
        flatten(transform(sort_array(collect_list(
          struct(col("start_off"), col("piece")))), s => s("piece")))
          .as("tokens"),
        count(lit(1)).cast("long").as("n_docs"),
        // collect_list drops nulls (carried-over pieces); ascending
        // offsets = the trainer's reset positions in order
        sort_array(collect_list(col("bnd"))).as("bnds"))
      .select(col("shard"), col("seq_id"),
        size(col("tokens")).cast("long").as("n_tokens"), col("n_docs"),
        array_join(transform(col("bnds"), _.cast("string")), ",")
          .as("doc_bounds"),
        md5(concat_ws("|", col("tokens"))).as("tokens_digest"))
  }
}
