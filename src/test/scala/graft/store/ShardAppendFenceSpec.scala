package graft.store

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The appendSharded-vs-reShard race fence (VERDICT r10 #4):
  * [[Store.appendSharded]] validates the family chain BEFORE its
  * transaction, and a concurrent [[Store.reShard]] from another
  * process can stamp, move, and delete a shard in between — a write
  * to the just-deleted key would silently RECREATE it as a zombie no
  * family reader consults. The fence re-checks the routing
  * preconditions INSIDE each per-shard write lock (fresh sidecar
  * read, serialized against the competitor's own locked updateKv).
  * Each test injects the interleaving via the package-private
  * `afterValidate` seam and asserts the append fails LOUDLY with the
  * remedy named and the family intact.
  */
class ShardAppendFenceSpec extends SparkSpec {
  import spark.implicits._

  private val idx: Indexer[String] =
    Indexer.of[String](1)(k => Seq(Seq(k)))(l =>
      if (l.head.length == 1) Some(l.head.head) else None)

  private def evDf(lo: Long, n: Long): DataFrame =
    spark.range(lo, lo + n).toDF("t").withColumn("v", col("t") * 1.5)

  private val opts = WriteOpts("t", NRows(1000))

  private def family(): (Store[String], Seq[String]) = {
    val st = new Store(spark, s"${tmpDir("fence")}/st", idx)
    val ks = st.shardedWrite(evDf(0, 9000), opts, i => s"s$i",
      targetRowsPerShard = 3000L)
    assert(ks.size == 3)
    (st, ks)
  }

  test("reShard STAMPS a shard between validation and write: append " +
      "fails loudly naming finishReShard; no rows land anywhere") {
    val (st, ks) = family()
    val before = ks.map(k => k -> st.get(k).meta.totalRows).toMap
    val e = intercept[IllegalArgumentException] {
      st.appendShardedHooked(evDf(9000, 300), opts, ks)(() =>
        // the competitor's first move, landed in the race window
        st.get(ks(1)).updateKv(Map(Store.RetiringKey ->
          (Store.ReShardTokenPrefix + "t1"))))
    }
    assert(e.getMessage.contains("mid-reShard") &&
      e.getMessage.contains("finishReShard"), e.getMessage)
    // transaction rolled back: no shard grew
    ks.foreach { k =>
      assert(st.get(k).meta.totalRows == before(k), s"shard $k grew")
    }
    // the family converges with one command and reads clean
    st.finishReShard(ks(1)): Unit
    assert(st.rangeDFAcross(ks).count() == 9000L)
  }

  test("reShard COMPLETES (old key deleted) between validation and " +
      "write: append fails loudly instead of recreating the key") {
    val (st, ks) = family()
    val e = intercept[IllegalArgumentException] {
      st.appendShardedHooked(evDf(9000, 300), opts, ks) { () =>
        // a full competing reShard of the middle shard: replacements
        // committed, bounds re-stamped, old key DELETED
        st.reShard(ks(1), opts, i => s"r$i",
          targetRowsPerShard = 1500L): Unit
      }
    }
    assert(e.getMessage.contains("vanished") &&
      e.getMessage.contains("re-discover"), e.getMessage)
    // the old key was NOT recreated as a zombie
    assert(!st.get(ks(1)).exists, "deleted shard key was recreated")
    // every original row is readable through the re-discovered family
    val newKs = st.keys.toSeq
    assert(st.rangeDFAcross(newKs).count() == 9000L)
    // and the retried append against the current family lands
    st.appendSharded(evDf(9000, 300), opts, newKs): Unit
    assert(st.rangeDFAcross(newKs).count() == 9300L)
  }

  test("a shard's recorded range re-stamped between validation and " +
      "write: append fails loudly on the bound mismatch") {
    val (st, ks) = family()
    val e = intercept[IllegalArgumentException] {
      st.appendShardedHooked(evDf(9000, 300), opts, ks)(() =>
        st.get(ks(2)).updateKv(Map("graft.shard.hiExcl" -> "123456")))
    }
    assert(e.getMessage.contains("range changed"), e.getMessage)
  }
}
