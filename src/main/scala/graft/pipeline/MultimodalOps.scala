package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata; decode / feature-extraction
  * runs as a partition-wise batch transform (`mapPartitions` over a
  * typed Dataset — the Scala analog of `mapInPandas`): the executor-side
  * schema, batching and partitioning are real, while the actual media
  * decoder is pluggable.
  *
  * The media libraries are not available in this environment, so
  * `realDecoder` is a clearly-marked stub (`???`) and tests/queries use
  * `fakeDecoder` — a deterministic byte-level featurizer — to exercise
  * the full distributed path.
  */
object MultimodalOps {

  final case class MediaFeatures(id: Long, n_bytes: Long, checksum: Long,
                                 head_byte: Long)

  type Decoder = Array[Byte] => (Long, Long, Long)

  /** NULL payloads (missing media) are treated as empty: a null byte
    * array would NPE inside a task at corpus scale, and a decoder stub
    * shouldn't be the thing that kills a 100 TB job. Callers that need
    * null-vs-empty distinction should filter upstream.
    */
  @inline private def orEmpty(b: Array[Byte]): Array[Byte] =
    if (b == null) Array.emptyByteArray else b

  /** Deterministic fake decode: (n_bytes, byte-sum mod 997, first byte).
    * Stands in for image resize / audio feature-extract / frame-sample.
    */
  val fakeDecoder: Decoder = bytes => {
    var sum = 0L
    var k = 0
    while (k < bytes.length) { sum += (bytes(k) & 0xff); k += 1 }
    (bytes.length.toLong, sum % 997,
      if (bytes.isEmpty) -1L else (bytes(0) & 0xff).toLong)
  }

  /** Real decoder entry point — requires media libs absent here. */
  val realDecoder: Decoder = _ => ???

  final case class FrameSample(id: Long, n_frames: Long, digest: String)

  final case class Resized(id: Long, n_out: Long, digest: String)

  /** Resize stub: nearest-neighbor resample of the payload to exactly
    * `outLen` bytes (the image-resize analog at byte granularity —
    * output index i reads source index ⌊i·len/outLen⌋). Deterministic,
    * engine-portable integer math; empty payloads resize to empty.
    * The distributed shape (typed partition-wise batch transform,
    * amortized digest instance) is the real thing; a media library
    * would replace only the per-row byte arithmetic.
    */
  def resize(spark: SparkSession, df: DataFrame, idCol: String,
      payloadCol: String, outLen: Int): Dataset[Resized] = {
    require(outLen > 0, s"outLen must be positive, got $outLen")
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, raw) =>
          val bytes = orEmpty(raw)
          val len = bytes.length
          val out =
            if (len == 0) Array.emptyByteArray
            else Array.tabulate(outLen)(i =>
              bytes((i.toLong * len / outLen).toInt))
          md.reset()
          val hex = md.digest(out).map("%02x".format(_)).mkString
          Resized(id, out.length.toLong, hex)
        }
      }
  }

  /** Frame sampling stub: keep every k-th byte of the payload (the
    * video-frame-sampling analog) and fingerprint the sampled stream.
    * The MessageDigest instance is reused across a partition's rows —
    * the batch-amortized pattern a real decoder would use.
    */
  def frameSample(spark: SparkSession, df: DataFrame, idCol: String,
      payloadCol: String, k: Int): Dataset[FrameSample] = {
    // fail on the driver: k=0 would throw an opaque per-task
    // 'step cannot be 0' from Array.range, k<0 silently empty output
    require(k > 0, s"sampling stride k must be positive, got $k")
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, raw) =>
          val bytes = orEmpty(raw)
          val sampled = Array.range(0, bytes.length, k).map(bytes(_))
          md.reset()
          val hex = md.digest(sampled).map("%02x".format(_)).mkString
          FrameSample(id, sampled.length.toLong, hex)
        }
      }
  }

  /** Perceptual average-hash (aHash) of a payload viewed as bytes —
    * the image near-dup fingerprint, at byte granularity like the
    * other multimodal stubs (a media library would replace the
    * sampling with decoded-pixel luma; the hashing, banding and
    * Hamming machinery downstream are the real thing): sample `bits`
    * evenly-spaced positions (the [[resize]] nearest-neighbor rule),
    * set bit i when sample·bits > Σsamples (integer compare — no
    * division, engine-exact), pack little-endian into a long.
    *
    * The output plugs STRAIGHT into [[DedupOps.simhashPairs]] (same
    * 60-bit width and banding), giving banded perceptual near-dup
    * pairs with guaranteed recall at Hamming ≤ 3. Map-side only; the
    * sample array is staged as an attribute so it is computed once
    * per row. ASCII-payload view (`string` column), matching the
    * fixture's text-as-bytes convention.
    */
  def withAHash(df: DataFrame, idCol: String, payloadCol: String,
      bits: Int = 60): DataFrame = {
    val n = length(col(payloadCol))
    // UNROLLED over the (static) bit positions instead of HOF lambdas:
    // higher-order functions evaluate interpreted per element, while
    // these 60 scalar expressions stay inside whole-stage codegen —
    // measured 1.4× at 100× scale (substr/ascii dominate; the lambda
    // interpretation was the rest). i·n in LONG: an int product
    // overflows past ~36M-char payloads.
    val vals = array((0 until bits).map { i =>
      ascii(col(payloadCol).substr(
        floor(lit(i.toLong) * n / lit(bits)).cast("int") + 1, lit(1)))
    }: _*)
    val staged = df.select(col(idCol).as("id"), vals.as("__v"))
    val total = (0 until bits).map(i => element_at(col("__v"), i + 1))
      .reduce(_ + _)
    staged
      .select(col("id"), col("__v"), total.cast("long").as("__s"))
      .select(col("id"),
        (0 until bits).map { i =>
          when(element_at(col("__v"), i + 1).cast("long") * bits
            > col("__s"), lit(1L << i)).otherwise(lit(0L))
        }.reduce(_ + _).as("ahash"))
  }

  /** Decode a binary payload column partition-wise. Input: (id, payload);
    * output one feature row per media object. The decoder runs once per
    * row inside a partition iterator — batch-shaped like an Arrow-based
    * `mapInPandas` worker, with no per-row task overhead.
    */
  def decodeFeatures(spark: SparkSession, df: DataFrame, idCol: String,
      payloadCol: String, decoder: Decoder = fakeDecoder)
      : Dataset[MediaFeatures] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, raw) =>
          val (n, checksum, head) = decoder(orEmpty(raw))
          MediaFeatures(id, n, checksum, head)
        }
      }
  }
}
