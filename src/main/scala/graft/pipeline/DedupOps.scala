package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for training-data pipelines, each designed
  * band-first so candidate generation is a shuffle-join on short keys —
  * never an n² cross join — and therefore scales to 100 TB corpora:
  *
  *  - exact: hash-groupBy on a content digest;
  *  - MinHash + LSH: shingle → md5-minhash signature → banded bucket
  *    join → exact Jaccard verification of candidates only;
  *  - SimHash: 16-bit majority-vote fingerprint → 4×4-bit pigeonhole
  *    bands (guaranteed recall at Hamming ≤ 3) → verified Hamming join;
  *  - exact n-gram Jaccard: distinct-shingle equi-join (bounded by
  *    Σ df(shingle)², not n²).
  *
  * All hashing is md5-based: equal-length lowercase hex strings compare
  * lexicographically == numerically in every engine, which is what makes
  * the DuckDB oracles exact.
  */
object DedupOps {

  /** Exact dedup: keep the smallest `keyCol` row per content digest. */
  def exactDedup(df: DataFrame, contentCol: String, keyCol: String)
      : DataFrame = {
    val w = Window.partitionBy(md5(col(contentCol))).orderBy(col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** (id, shingle) exploded distinct word-ngram shingles. */
  def shingleTable(df: DataFrame, idCol: String, textCol: String, n: Int)
      : DataFrame =
    df.select(col(idCol).as("id"),
      explode(TextOps.wordShingles(col(textCol), n)).as("g"))

  /** MinHash signature columns s0..s(k-1): per-seed min over shingles of
    * md5(seed|shingle). The seed hashes are computed once per DISTINCT
    * shingle and joined back — identical minima, ~|corpus|/|vocab| fewer
    * md5 evaluations (the shingle vocabulary is far smaller than the
    * exploded (doc, shingle) table at corpus scale).
    */
  def minhashSignature(shingles: DataFrame, numHashes: Int): DataFrame = {
    val gh = shingles.select("g").distinct().select(
      col("g") +: (0 until numHashes).map(i =>
        md5(concat(lit(s"$i|"), col("g"))).as(s"h$i")): _*)
    val aggs = (0 until numHashes).map(i => min(col(s"h$i")).as(s"s$i"))
    shingles.join(broadcast(gh), "g").groupBy("id")
      .agg(aggs.head, aggs.tail: _*)
  }

  /** LSH candidate pairs from banded minhash signatures. */
  def lshCandidates(sig: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    val rows = numHashes / bands
    val bandCols = (0 until bands).map(b =>
      concat((b * rows until (b + 1) * rows).map(i => col(s"s$i")): _*)
        .as(s"band$b"))
    val withBands = sig.select(col("id") +: bandCols: _*)
    val exploded = withBands.select(col("id"),
      posexplode(array((0 until bands).map(b => col(s"band$b")): _*))
        .as(Seq("band_id", "sig")))
    val a = exploded.as("a"); val b = exploded.as("b")
    a.join(b, col("a.band_id") === col("b.band_id") &&
        col("a.sig") === col("b.sig") && col("a.id") < col("b.id"))
      .select(col("a.id").as("i"), col("b.id").as("j"))
      .distinct()
  }

  /** Exact Jaccard for given (i, j) candidate pairs over a shingle
    * table; output keeps pairs with jac >= threshold.
    */
  def jaccardVerify(cand: DataFrame, shingles: DataFrame, threshold: Double)
      : DataFrame = {
    // candidates are tiny relative to the shingle table (that's the
    // point of LSH) — broadcast them so the shingle table streams
    // through both verification joins without ever shuffling
    val counts = shingles.groupBy("id").agg(count(lit(1)).as("n"))
    val aSide = shingles.as("sa")
      .join(broadcast(cand), col("sa.id") === col("i"))
      .select(col("i"), col("j"), col("sa.g").as("__ga"))
    val inter = shingles.as("sb")
      .join(broadcast(aSide), col("sb.id") === col("j") &&
        col("sb.g") === col("__ga"))
      .groupBy("i", "j").agg(count(lit(1)).as("inter"))
    inter
      .join(broadcast(counts).as("ca"), col("i") === col("ca.id"))
      .join(broadcast(counts).as("cb"), col("j") === col("cb.id"))
      .select(col("i"), col("j"),
        (col("inter").cast("double") /
          (col("ca.n") + col("cb.n") - col("inter"))).as("jac"))
      .filter(col("jac") >= threshold)
  }

  /** Exact all-pairs n-gram Jaccard via the distinct-shingle equi-join
    * (no candidate pruning — the exact baseline the approximate methods
    * are judged against).
    */
  def exactJaccardPairs(shingles: DataFrame, threshold: Double): DataFrame = {
    val pairs = shingles.as("sa")
      .join(shingles.as("sb"), col("sa.g") === col("sb.g") &&
        col("sa.id") < col("sb.id"))
      .groupBy(col("sa.id").as("i"), col("sb.id").as("j"))
      .agg(count(lit(1)).as("inter"))
    val counts = shingles.groupBy("id").agg(count(lit(1)).as("n"))
    pairs
      .join(counts.as("ca"), col("i") === col("ca.id"))
      .join(counts.as("cb"), col("j") === col("cb.id"))
      .select(col("i"), col("j"),
        (col("inter").cast("double") /
          (col("ca.n") + col("cb.n") - col("inter"))).as("jac"))
      .filter(col("jac") >= threshold)
  }

  /** Simhash width in bits (hex digits of md5 consumed = SimhashBits/4)
    * and its pigeonhole banding: 4 bands of 8 bits — any pair within
    * Hamming distance 3 shares at least one intact band, and an 8-bit
    * band key keeps random collisions at ~2^-8 so the candidate join
    * stays sparse at corpus scale.
    */
  val SimhashBits = 32
  val SimhashBands = 4

  /** SimHash over distinct words: bit (4p+b) is the majority vote of
    * bit b of hex digit p of md5(word). Pure integer arithmetic →
    * engine-portable.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val nDigits = SimhashBits / 4
    val words = df.select(col(idCol).as("id"),
      explode(array_distinct(TextOps.wsTokens(col(textCol)))).as("w"))
    // hash each DISTINCT word once and broadcast-join the digit table —
    // md5+hex-conv runs |vocabulary| times, not |corpus × words| times
    val wh = words.select("w").distinct().withColumn("h", md5(col("w")))
    val digitTable = (0 until nDigits).foldLeft(wh) { (d, p) =>
      d.withColumn(s"d$p",
        conv(substring(col("h"), p + 1, 1), 16, 10).cast("long"))
    }.drop("h")
    val withDigits = words.join(broadcast(digitTable), "w")
    // per id: vote for each bit, then majority → simhash int
    val bitSums = (0 until SimhashBits).map { bit =>
      val p = bit / 4; val b = bit % 4
      sum((col(s"d$p").divide(lit(1L << b)).cast("long")) % 2)
        .as(s"v$bit")
    }
    val voted = withDigits.groupBy("id")
      .agg(count(lit(1)).as("nw"), bitSums: _*)
    val sh = (0 until SimhashBits).map { bit =>
      when(col(s"v$bit") * 2 >= col("nw"), lit(1L << bit)).otherwise(lit(0L))
    }.reduce(_ + _)
    voted.select(col("id"), sh.as("simhash"))
  }

  /** Near-dup pairs at Hamming distance <= maxDist via pigeonhole bands.
    */
  def simhashPairs(sim: DataFrame, maxDist: Int): DataFrame = {
    val bandBits = SimhashBits / SimhashBands
    val banded = sim.select(col("id"), col("simhash"),
      posexplode(array((0 until SimhashBands).map(b =>
        (col("simhash").divide(lit(1L << (bandBits * b))).cast("long"))
          % (1L << bandBits)): _*))
        .as(Seq("band_id", "band_val")))
    // dedup bare (i, j) pairs first, then broadcast-join the hashes
    // back — the distinct never carries payload columns
    val a = banded.as("a"); val b = banded.as("b")
    val cand = a.join(b, col("a.band_id") === col("b.band_id") &&
        col("a.band_val") === col("b.band_val") && col("a.id") < col("b.id"))
      .select(col("a.id").as("i"), col("b.id").as("j"))
      .distinct()
    cand
      .join(broadcast(sim.select(col("id"), col("simhash").as("sa"))),
        col("i") === col("id")).drop("id")
      .join(broadcast(sim.select(col("id"), col("simhash").as("sb"))),
        col("j") === col("id")).drop("id")
      .withColumn("dist", bit_count(col("sa").bitwiseXOR(col("sb"))))
      .filter(col("dist") <= maxDist)
      .select("i", "j", "dist")
  }
}
