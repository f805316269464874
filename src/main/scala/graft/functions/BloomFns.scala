package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.graftbridge.SparkInternals
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Driver-built Bloom filters applied as codegen'd map-side predicates —
  * the same machinery Spark's runtime row-level filtering injects for
  * shuffle joins (`BloomFilterMightContain`), exposed for explicit use:
  * build a filter over a SMALL key set (an eval benchmark, a blocklist,
  * yesterday's delta), embed it in the plan as a binary literal, and
  * prefilter a 100 TB side without shuffling it.
  *
  * Hashing contract: both sides go through `xxhash64`, so the builder
  * inserts longs (`BloomFilter.putLong`) and the probe expression calls
  * `mightContainLong` — the exact pairing Spark's own injected runtime
  * filters use. False positives pass the prefilter and must be removed
  * by an exact residual (join/equality) downstream; false negatives are
  * impossible, so the prefilter never changes results, only plan cost.
  */
object BloomFns {

  /** Build a Bloom filter over `xxhash64(keyCol)` of `df` (collected to
    * the driver — the build side must be the bounded one).
    */
  def build(df: DataFrame, keyCol: Column, expectedItems: Long,
      fpp: Double): BloomFilter =
    df.select(xxhash64(keyCol).as("__h")).stat
      .bloomFilter("__h", expectedItems, fpp)

  /** Serialize a Bloom filter to plan-embeddable bytes. */
  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Codegen'd membership test: true iff `xxhash64(keyCol)` might be in
    * the serialized filter. Embeds the filter as a literal — sized for
    * build sides up to tens of MB; bigger build sides should flip to a
    * shuffle join instead (at that point the "small side" isn't).
    */
  def mightContain(bloomBytes: Array[Byte], keyCol: Column): Column =
    SparkInternals.column(BloomFilterMightContain(
      Literal(bloomBytes, BinaryType),
      SparkInternals.expressionEager(xxhash64(keyCol))))
}
