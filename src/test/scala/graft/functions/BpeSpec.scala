package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the BPE tokenizer's three load-bearing properties: known
  * encodings under the fixture vocabulary, the greedy-loop /
  * rank-ordered-replace-chain equivalence the DuckDB oracle depends on
  * (checked inside one engine here; the cross-engine pin is the
  * driver's oracle compare on p_text_tokens_bpe), and the
  * well-formedness validation that makes that equivalence a checked
  * precondition instead of an assumption.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val T = Bpe.fixtureTable

  test("known encodings under the fixture vocabulary") {
    val cases = Seq(
      // whole-vocab words collapse to one token
      "table" -> Seq("table"), "value" -> Seq("value"),
      "spark" -> Seq("spark"), "sort" -> Seq("sort"),
      "window" -> Seq("window"), "the" -> Seq("the"),
      "batch" -> Seq("batch"), "merge" -> Seq("merge"),
      "hash" -> Seq("hash"), "scan" -> Seq("scan"),
      // derived forms split at the learned boundary
      "scans" -> Seq("scan", "s"),
      // out-of-vocab stays at single atoms
      "zz" -> Seq("z", "z"),
      "" -> Nil)
    cases.foreach { case (w, want) =>
      assert(Bpe.encodeWord(w, T) == want, s"word '$w'")
    }
    // 'sorting' must START with the whole 'sort' token (the derived
    // suffix's exact split is vocabulary detail, the prefix is not)
    assert(Bpe.encodeWord("sorting", T).head == "sort")
  }

  test("count = sum over space-split words; empty words count zero") {
    import org.apache.spark.unsafe.types.UTF8String
    def c(s: String): Long = Bpe.countTokens(UTF8String.fromString(s), T)
    assert(c("the table") == 2L)
    assert(c("") == 0L)
    assert(c("   ") == 0L)
    assert(c(" the  table ") == 2L)
    assert(c("zz the") == 3L)
  }

  test("greedy loop == rank-ordered replace chain on the corpus " +
      "(the oracle equivalence, pinned inside one engine)") {
    val d = "/root/testdata/sf0.001"
    assume(new java.io.File(d).isDirectory, s"$d absent")
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("text"))
    val out = docs.select(
        Bpe.bpeTokenCount(col("text"), T).as("greedy"),
        Bpe.chainCountColumn(col("text")).as("chain"))
      .filter(col("greedy") =!= col("chain"))
    assert(out.count() == 0L, out.limit(5).collect().mkString(","))
  }

  test("greedy == chain on adversarial overlap shapes") {
    val t1 = Bpe.Table.fromPairs(Seq("a" -> "a"))
    val t2 = Bpe.Table.fromPairs(Seq("a" -> "a", "aa" -> "aa"))
    val t3 = Bpe.Table.fromPairs(Seq("a" -> "b"))
    val rows = Seq("aaaa", "aaa", "aaaaa", "abab", "aabab a", "",
      "babab", "aa aa aaa").toDF("text")
    for (t <- Seq(t1, t2, t3)) {
      val bad = rows.select(
          Bpe.bpeTokenCount(col("text"), t).as("g"),
          Bpe.chainCountColumn(col("text"), t.merges).as("c"),
          col("text"))
        .filter(col("g") =!= col("c")).collect()
      assert(bad.isEmpty, bad.mkString(","))
    }
    // spot-pin absolute values for the classic overlap case
    assert(Bpe.encodeWord("aaa", t1) == Seq("aa", "a"))
    assert(Bpe.encodeWord("aaaa", t2) == Seq("aaaa"))
    assert(Bpe.encodeWord("ababa", t3) == Seq("ab", "ab", "a"))
  }

  test("well-formedness is validated at construction") {
    // pair referencing a token no earlier merge created
    val e1 = intercept[IllegalArgumentException] {
      Bpe.Table.fromPairs(Seq("ab" -> "c"))
    }
    assert(e1.getMessage.contains("well-formed"))
    // re-creating an existing output (duplicate pair)
    val e2 = intercept[IllegalArgumentException] {
      Bpe.Table.fromPairs(Seq("a" -> "b", "a" -> "b"))
    }
    assert(e2.getMessage.contains("re-creates"))
    // wrapper chars and spaces are reserved (control chars since r12 —
    // literal '<'/'>' are ordinary text and legal in merge sides)
    assert(intercept[IllegalArgumentException] {
      Bpe.Table.fromPairs(Seq(Bpe.WrapL -> "a"))
    }.getMessage.contains("wrapper"))
    Bpe.Table.fromPairs(Seq("<" -> ">")): Unit // now well-formed
    // the fixture table itself constructs (validates) cleanly
    assert(T.merges.size == Bpe.FixtureMerges.size)
  }

  test("bpe_tokens emits the token sequence (order preserved, empty " +
      "words dropped)") {
    val out = Seq((1L, "the table"), (2L, " scans  zz "))
      .toDF("id", "text")
      .select(col("id"), array_join(Bpe.bpeTokens(col("text"), T), "|")
        .as("t"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "the|table", out(1L))
    assert(out(2L) == "scan|s|z|z", out(2L))
  }

  test("train: corpus-trained table is deterministic, well-formed by " +
      "construction, compresses the corpus, and keeps the " +
      "greedy==chain oracle equivalence") {
    val d = "/root/testdata/sf0.001"
    assume(new java.io.File(d).isDirectory, s"$d absent")
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("text"))
    // 90 merges saturate the synthetic corpus's ~30-word vocabulary
    // (measured: token/char ratio 0.645 at 30 merges, 0.423 at 60,
    // 0.222 at the 89-merge exhaustion point — every vocab word
    // collapses and training stops early on an empty pair space).
    // Size asserts stay RANGES: the driver regenerates testdata
    // between rounds and the exact exhaustion point may move.
    val t1 = Bpe.train(docs, "text", nMerges = 90)
    val t2 = Bpe.train(docs, "text", nMerges = 90)
    assert(t1.merges == t2.merges, "training must be deterministic")
    assert(t1.merges.size >= 60 && t1.merges.size <= 90,
      s"unexpected merge count ${t1.merges.size}")
    // Table construction validated well-formedness; compression:
    // trained tokens strictly under character count, and the trained
    // table satisfies the same chain equivalence the fixture does
    // (well-formed by construction), so a trained vocabulary is
    // immediately DuckDB-oracle-able
    val stats = docs.select(
        Bpe.bpeTokenCount(col("text"), t1).as("g"),
        Bpe.chainCountColumn(col("text"), t1.merges).as("c"),
        length(regexp_replace(col("text"), " ", "")).cast("long")
          .as("chars"))
    assert(stats.filter(col("g") =!= col("c")).count() == 0L,
      "trained table broke the greedy==chain equivalence")
    val agg = stats.agg(sum("g"), sum("chars")).head()
    assert(agg.getLong(0) < agg.getLong(1) / 2,
      s"90 merges should compress the corpus >2x over chars: " +
        s"${agg.getLong(0)} vs ${agg.getLong(1)}")
    // at vocab saturation the corpus's most frequent multi-char word
    // is ONE token (derived, not hardcoded: testdata regenerates)
    val topWord = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").count().orderBy(col("count").desc, col("w"))
      .head().getString(0)
    assert(Bpe.encodeWord(topWord, t1) == Seq(topWord),
      s"top corpus word '$topWord' should collapse to one token")
  }

  test("null text propagates null; merges load from lines and " +
      "DataFrame") {
    val out = Seq((1L, "the"), (2L, null)).toDF("id", "text")
      .select(col("id"), Bpe.bpeTokenCount(col("text"), T).as("n"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out(1L).contains(1L) && out(2L).isEmpty)
    val lines = Bpe.FixtureMerges.map { case (a, b) => s"$a $b" }
    assert(Bpe.Table.fromLines(lines).merges == T.merges)
    val df = lines.zipWithIndex.map { case (l, i) => (l, i) }
      .toDF("line", "rank")
    assert(Bpe.Table.fromDataFrame(df).merges == T.merges)
  }

  test("word memo: warm-cache encodes are byte-identical and the " +
      "insert cap holds under adversarial vocabularies") {
    // fresh table so this test controls the cache population
    val t = new Bpe.Table(Bpe.FixtureMerges)
    val words = Seq("spark", "scans", "table", "zzz", "sorting")
    val cold = words.map(w => Bpe.encodeWord(w, t))
    // drive the memoized path twice (cold fill, then warm probes)
    val viaExpr = () => words.map { w =>
      Bpe.tokensOf(
        org.apache.spark.unsafe.types.UTF8String.fromString(w), t)
        .toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq
    }
    assert(viaExpr() == cold)
    assert(viaExpr() == cold) // warm: served from the memo
    // multi-char AND single-char words land in the cache (the count
    // path shortcuts singles, the tokens path caches them; distinct
    // singles are alphabet-bounded so they cannot crowd the cap)
    assert(t.cache.size >= words.count(_.length > 1) - 0)
    // insert cap: size never exceeds MaxCacheWords even when the
    // distinct-word stream is larger (synthetic words, all distinct)
    val small = new Bpe.Table(Seq("a" -> "b"))
    (0 until Bpe.MaxCacheWords + 100).foreach { i =>
      Bpe.countTokens(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"w$i ab"),
        small): Unit
    }
    // the insert guard reads size then puts without a lock, so under
    // concurrent tasks the cap can overshoot by ~the thread count —
    // assert a small slack, not an exact bound (ADVICE r14)
    assert(small.cache.size <= Bpe.MaxCacheWords + 64)
    // and over-cap words still encode correctly (compute path)
    assert(Bpe.encodeWord("ab", small) == Seq("ab"))
  }
}
