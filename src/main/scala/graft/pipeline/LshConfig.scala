package graft.pipeline

/** Sign-projection key-space configuration for the embedding near-dup
  * family ([[SimilarityOps.lshNearDupPairs]],
  * [[DedupIndex.buildEmbedding]]/`probeEmbedding`).
  *
  * The banded candidate join produces a random-collision floor of
  * roughly `nBands · n² / 2^(planesPerBand+1)` pairs for an
  * n-vector corpus — a FIXED band width therefore saturates once the
  * corpus outgrows it (measured: 6-bit bands die at a 200k-vector
  * corpus with a disk-filling candidate spill, SCALE.md round-5d).
  * Every 2 extra band bits cut that floor 4×, so the key width is a
  * function of corpus size, not a constant. [[forCorpusSize]] is that
  * function as code: it sizes band bits so the EXPECTED uniform bucket
  * holds ~`targetBucketRows` rows, clamped so small corpora keep the
  * historical 24×6 shape (oracle parity at every driver scale factor
  * is pinned by LshConfigSpec).
  *
  * Recall trade-off (standard LSH): wider bands lower the chance two
  * vectors at the cosine threshold share a band, while exact
  * duplicates (cosine 1) collide at any width. Callers wanting a
  * fixed recall curve across corpus sizes should raise `nBands`
  * alongside the corpus rather than pinning the band width.
  */
final case class LshConfig(nPlanes: Int, planesPerBand: Int) {
  require(planesPerBand > 0 && nPlanes > 0 &&
    nPlanes % planesPerBand == 0,
    s"nPlanes=$nPlanes must be a positive multiple of " +
      s"planesPerBand=$planesPerBand")

  def nBands: Int = nPlanes / planesPerBand

  /** Buckets per band (the key space one band can spread rows over). */
  def bucketsPerBand: Long = 1L << planesPerBand

  /** Expected banded candidate pairs for an n-vector corpus under a
    * uniform hash: `nBands · n²/2 / 2^planesPerBand`. The arithmetic
    * behind the saturation fail-fast — no Spark action required.
    */
  def expectedCandidatePairs(n: Long): Double =
    nBands.toDouble * n.toDouble * n.toDouble /
      (2.0 * bucketsPerBand.toDouble)
}

object LshConfig {
  /** Band count: recall knob, kept at the historical 4 bands. */
  val DefaultBands = 4

  /** Floor = the historical 6-bit bands: every corpus up to
    * `TargetBucketRows · 2^6 = 32k` vectors resolves to the exact
    * 24×6 config all driver-SF oracles were built against.
    */
  val MinBits = 6

  /** 2^20 buckets/band — beyond this, grow `nBands`/sharding, not bits
    * (a 20-bit band already keeps million-row buckets sub-target for
    * corpora up to ~5×10^8 vectors).
    */
  val MaxBits = 20

  /** Target EXPECTED rows per bucket; 500 keeps the candidate floor
    * `nBands · n · target/2` — linear in the corpus.
    */
  val TargetBucketRows = 500L

  /** Size the band width for an n-vector corpus:
    * `bits = clamp(ceil(log2(n / targetBucketRows)), minBits, maxBits)`,
    * `nPlanes = nBands · bits`. Driver scale factors (500 / 2k / 20k
    * vectors) all resolve to the historical 24×6; the 200k corpus that
    * killed the fixed config resolves to 36×9 (512 buckets/band).
    */
  def forCorpusSize(n: Long, nBands: Int = DefaultBands,
      targetBucketRows: Long = TargetBucketRows,
      minBits: Int = MinBits, maxBits: Int = MaxBits): LshConfig = {
    require(n >= 0, s"corpus size must be >= 0, got $n")
    require(targetBucketRows > 0,
      s"targetBucketRows must be positive, got $targetBucketRows")
    require(nBands > 0, s"nBands must be positive, got $nBands")
    require(minBits > 0 && maxBits >= minBits,
      s"need 0 < minBits <= maxBits, got $minBits..$maxBits")
    val raw =
      if (n <= targetBucketRows) minBits
      else math.ceil(
        math.log(n.toDouble / targetBucketRows) / math.log(2.0)).toInt
    val bits = math.min(maxBits, math.max(minBits, raw))
    LshConfig(nBands * bits, bits)
  }
}
