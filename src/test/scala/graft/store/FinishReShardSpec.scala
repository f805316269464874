package graft.store

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[Store.finishReShard]] — one-command crash recovery for an
  * interrupted [[Store.reShard]]. Each test injects a crash at one
  * step of reShard's sequence (stamp → shardedWrite commit → re-stamp
  * lo → re-stamp hi → delete) by constructing that exact on-disk
  * state with the store's own primitives, then asserts finishReShard
  * converges the family: either the replacements win (complete chain,
  * old key deleted, outer bounds repaired) or the old key wins
  * (partial/absent replacements deleted, stamp removed) — and the row
  * set is identical either way.
  */
class FinishReShardSpec extends SparkSpec {
  import spark.implicits._

  private val idx: Indexer[String] =
    Indexer.of[String](1)(k => Seq(Seq(k)))(l =>
      if (l.head.length == 1) Some(l.head.head) else None)

  private def newStore(): Store[String] =
    new Store(spark, s"${tmpDir("finishreshard")}/st", idx)

  private def evDf(n: Int): DataFrame =
    spark.range(n.toLong).toDF("t").withColumn("v", col("t") * 1.5)

  private val opts = WriteOpts("t", NRows(1000))

  /** A 3-shard family; returns (store, keys). */
  private def family(): (Store[String], Seq[String]) = {
    val st = newStore()
    val ks = st.shardedWrite(evDf(9000), opts, i => s"s$i",
      targetRowsPerShard = 3000L)
    assert(ks.size == 3)
    (st, ks)
  }

  private def token() =
    Store.ReShardTokenPrefix + java.util.UUID.randomUUID().toString

  test("crash after the stamp, before any replacement commits: " +
      "finishReShard rolls back (un-stamps), family reads as before") {
    val (st, ks) = family()
    val tok = token()
    st.get(ks(1)).updateKv(Map(Store.RetiringKey -> tok))
    intercept[IllegalArgumentException] { st.rangeDFAcross(ks) }: Unit
    val res = st.finishReShard(ks(1))
    assert(res == ReShardRolledBack(Nil), res.toString)
    assert(!st.get(ks(1)).meta.kv.contains(Store.RetiringKey))
    assert(st.rangeDFAcross(ks).count() == 9000L)
    assert(st.keys.size == 3)
  }

  test("crash mid-transaction (hard kill): a partial prefix of " +
      "replacements is deleted and the stamp removed — no row lost, " +
      "none double-counted") {
    val (st, ks) = family()
    val tok = token()
    val oldKv = st.get(ks(1)).meta.kv
    val oldLo = oldKv("graft.shard.lo").toLong
    val oldHi = oldKv("graft.shard.hiExcl").toLong
    st.get(ks(1)).updateKv(Map(Store.RetiringKey -> tok))
    // hand-commit a PREFIX of the would-be replacement chain: shard 0
    // (open lo) and shard 1 ending on an interior quantile bound —
    // exactly what a kill -9 between the transaction's per-dataset
    // commits leaves behind
    val mid1 = oldLo + 1000
    val mid2 = oldLo + 2000
    st.get("r0").write(
      st.get(ks(1)).df.filter(col("t") < mid1),
      opts.copy(kv = Map(Store.ReplacesKey -> tok,
        "graft.shard.index" -> "0", "graft.shard.lo" -> "",
        "graft.shard.hiExcl" -> mid1.toString)))
    st.get("r1").write(
      st.get(ks(1)).df.filter(col("t") >= mid1 && col("t") < mid2),
      opts.copy(kv = Map(Store.ReplacesKey -> tok,
        "graft.shard.index" -> "1", "graft.shard.lo" -> mid1.toString,
        "graft.shard.hiExcl" -> mid2.toString)))
    val res = st.finishReShard(ks(1))
    assert(res == ReShardRolledBack(Seq("r0", "r1")), res.toString)
    assert(st.keys.toSeq.sorted == ks.sorted,
      s"partial replacements must be deleted, keys = ${st.keys}")
    assert(!st.get(ks(1)).meta.kv.contains(Store.RetiringKey))
    assert(st.rangeDFAcross(ks).count() == 9000L)
    assert(st.rangeDFAcross(ks).agg(sum("t")).head().getLong(0) ==
      (0L until 9000L).sum)
    assert(oldHi > mid2) // the prefix really was incomplete
  }

  test("crash after the replacements fully committed, before the " +
      "outer-bound re-stamps: finishReShard repairs both bounds and " +
      "deletes the old key") {
    val (st, ks) = family()
    val tok = token()
    val oldKv = st.get(ks(1)).meta.kv
    st.get(ks(1)).updateKv(Map(Store.RetiringKey -> tok))
    // the exact internal call reShard makes — committed, then "crash"
    val sub = st.shardedWrite(st.get(ks(1)).df,
      opts.copy(kv = Map(Store.ReplacesKey -> tok)),
      i => s"n$i", targetRowsPerShard = 1500L)
    assert(sub.size == 2)
    assert(st.get(sub.head).meta.kv("graft.shard.lo") == "")
    val res = st.finishReShard(ks(1))
    assert(res == ReShardCompleted(sub), res.toString)
    assert(!st.keys.contains(ks(1)), "old key must be deleted")
    assert(st.get(sub.head).meta.kv("graft.shard.lo") ==
      oldKv("graft.shard.lo"))
    assert(st.get(sub.last).meta.kv("graft.shard.hiExcl") ==
      oldKv("graft.shard.hiExcl"))
    val fam = st.keys.toSeq
    assert(st.rangeDFAcross(fam).count() == 9000L)
    // the converged family accepts routed appends (chain validates)
    st.appendSharded(Seq(4500L).toDF("t").withColumn("v", lit(-1.0)),
      opts, fam): Unit
    assert(st.rangeDFAcross(fam).count() == 9001L)
  }

  test("crash between the two outer re-stamps (lo done, hi not): " +
      "finishReShard stamps only the missing bound") {
    val (st, ks) = family()
    val tok = token()
    val oldKv = st.get(ks(1)).meta.kv
    st.get(ks(1)).updateKv(Map(Store.RetiringKey -> tok))
    val sub = st.shardedWrite(st.get(ks(1)).df,
      opts.copy(kv = Map(Store.ReplacesKey -> tok)),
      i => s"n$i", targetRowsPerShard = 1500L)
    st.get(sub.head).updateKv(
      Map("graft.shard.lo" -> oldKv("graft.shard.lo")))
    val res = st.finishReShard(ks(1))
    assert(res == ReShardCompleted(sub), res.toString)
    assert(st.get(sub.head).meta.kv("graft.shard.lo") ==
      oldKv("graft.shard.lo"))
    assert(st.get(sub.last).meta.kv("graft.shard.hiExcl") ==
      oldKv("graft.shard.hiExcl"))
    assert(st.rangeDFAcross(st.keys.toSeq).count() == 9000L)
  }

  test("crash after both re-stamps, before the delete: finishReShard " +
      "only deletes the old key") {
    val (st, ks) = family()
    val tok = token()
    val oldKv = st.get(ks(1)).meta.kv
    st.get(ks(1)).updateKv(Map(Store.RetiringKey -> tok))
    val sub = st.shardedWrite(st.get(ks(1)).df,
      opts.copy(kv = Map(Store.ReplacesKey -> tok)),
      i => s"n$i", targetRowsPerShard = 1500L)
    st.get(sub.head).updateKv(
      Map("graft.shard.lo" -> oldKv("graft.shard.lo")))
    st.get(sub.last).updateKv(
      Map("graft.shard.hiExcl" -> oldKv("graft.shard.hiExcl")))
    val res = st.finishReShard(ks(1))
    assert(res == ReShardCompleted(sub), res.toString)
    assert(!st.keys.contains(ks(1)))
    assert(st.rangeDFAcross(st.keys.toSeq).count() == 9000L)
  }

  test("retiring the LAST shard (open hiExcl): a partial prefix is " +
      "still detected — its interior upper bound cannot be open") {
    val (st, ks) = family()
    val tok = token()
    val lastLo = st.get(ks(2)).meta.kv("graft.shard.lo").toLong
    st.get(ks(2)).updateKv(Map(Store.RetiringKey -> tok))
    // prefix: one shard whose hiExcl is an interior bound — with the
    // old top OPEN, completeness requires an open top
    st.get("r0").write(
      st.get(ks(2)).df.filter(col("t") < lastLo + 500),
      opts.copy(kv = Map(Store.ReplacesKey -> tok,
        "graft.shard.index" -> "0", "graft.shard.lo" -> "",
        "graft.shard.hiExcl" -> (lastLo + 500).toString)))
    val res = st.finishReShard(ks(2))
    assert(res == ReShardRolledBack(Seq("r0")), res.toString)
    assert(st.rangeDFAcross(ks).count() == 9000L)
  }

  test("finishReShard is idempotent-safe: after converging, the old " +
      "key is gone and a re-run fails loudly instead of guessing") {
    val (st, ks) = family()
    val tok = token()
    st.get(ks(1)).updateKv(Map(Store.RetiringKey -> tok))
    val sub = st.shardedWrite(st.get(ks(1)).df,
      opts.copy(kv = Map(Store.ReplacesKey -> tok)),
      i => s"n$i", targetRowsPerShard = 1500L)
    assert(st.finishReShard(ks(1)) == ReShardCompleted(sub))
    val e = intercept[IllegalArgumentException] {
      st.finishReShard(ks(1))
    }
    assert(e.getMessage.contains("no dataset"), e.getMessage)
  }

  test("legacy or hand-written stamp (no token) refuses to guess and " +
      "names the manual two-option remedy") {
    val (st, ks) = family()
    st.get(ks(1)).updateKv(Map(Store.RetiringKey -> "1"))
    val e = intercept[IllegalArgumentException] {
      st.finishReShard(ks(1))
    }
    assert(e.getMessage.contains("legacy") &&
      e.getMessage.contains("delete") &&
      e.getMessage.contains(Store.RetiringKey), e.getMessage)
    // the manual remedy still works
    st.get(ks(1)).updateKv(Map.empty, remove = Seq(Store.RetiringKey))
    assert(st.rangeDFAcross(ks).count() == 9000L)
  }

  test("reShard rejects a NON-FRESH replacement key pre-commit — the " +
      "invariant that makes finishReShard's partial-rollback delete " +
      "safe") {
    val (st, ks) = family()
    // an unrelated populated dataset occupying a would-be replacement
    // key: an upsert into it would merge its rows with the moved ones,
    // and a later crash recovery's delete would destroy them
    st.get("occupied").write(
      Seq((1L, 9.0)).toDF("t", "v"), opts)
    val pre = st.get("occupied").df.collect().toSeq
    val e = intercept[IllegalArgumentException] {
      st.reShard(ks(1), opts,
        i => if (i == 0) "occupied" else s"f$i",
        targetRowsPerShard = 1500L)
    }
    assert(e.getMessage.contains("fresh"), e.getMessage)
    // nothing committed, stamp self-cleared, bystander untouched
    assert(!st.get(ks(1)).meta.kv.contains(Store.RetiringKey))
    assert(st.get("occupied").df.collect().toSeq == pre)
    assert(st.rangeDFAcross(ks).count() == 9000L)
  }

  test("a key that is not mid-reShard is rejected") {
    val (st, ks) = family()
    val e = intercept[IllegalArgumentException] {
      st.finishReShard(ks(0))
    }
    assert(e.getMessage.contains("not mid-reShard"), e.getMessage)
  }

  test("stale replaces tags from a COMPLETED re-shard never match a " +
      "later recovery (tokens are unique per attempt)") {
    val (st, ks) = family()
    // a real, successful reShard leaves provenance tags behind
    val sub = st.reShard(ks(1), opts, i => s"a$i",
      targetRowsPerShard = 1500L)
    assert(sub.forall(k =>
      st.get(k).meta.kv.get(Store.ReplacesKey).exists(
        _.startsWith(Store.ReShardTokenPrefix))))
    // now a NEW attempt on another shard crashes right after its stamp
    val tok = token()
    st.get(ks(0)).updateKv(Map(Store.RetiringKey -> tok))
    val res = st.finishReShard(ks(0))
    // the old tags must not be mistaken for this attempt's shards
    assert(res == ReShardRolledBack(Nil), res.toString)
    assert(st.rangeDFAcross(st.keys.toSeq).count() == 9000L)
  }

  test("shard pressure carries the remedy's ARGUMENTS: the suggested " +
      "split puts every piece at half the warn threshold") {
    // realistic near-cap numbers, computed without building 52k files
    val p = ShardPressure("hot", files = 60000, rows = 380_000_000L,
      capFraction = 60000.0 / OrderedDataset.MaxFilesPerDataset,
      nearCap = true, warnAt = 0.8)
    val perShard = p.files.toDouble / p.suggestedShards
    assert(perShard <= OrderedDataset.MaxFilesPerDataset * p.warnAt / 2.0,
      s"suggested ${p.suggestedShards} shards leave $perShard files each")
    assert(p.suggestedShards >= 2)
    assert(p.suggestedTargetRowsPerShard * p.suggestedShards.toLong >=
      p.rows, "the suggested target must cover every row")
    // and on a real store the rows field is the sidecar's totalRows
    val (st, ks) = family()
    val pr = st.shardPressure(ks)
    pr.foreach { sp =>
      assert(sp.rows == st.get(sp.key).meta.totalRows && sp.rows > 0)
      assert(sp.suggestedTargetRowsPerShard >= 1L)
    }
    // the injected-threshold pressure row suggests a split that the
    // real reShard accepts and that lands under the threshold
    val hot = st.shardPressure(Seq(ks(1)),
      warnAt = 2.0 / OrderedDataset.MaxFilesPerDataset).head
    assert(hot.nearCap)
    val sub = st.reShard(ks(1), opts, i => s"h$i",
      targetRowsPerShard = hot.suggestedTargetRowsPerShard)
    assert(sub.size >= 2, s"suggestion must actually split: $sub")
    assert(st.rangeDFAcross(st.keys.toSeq).count() == 9000L)
  }
}
