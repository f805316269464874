package graft.store

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** restoreTo (RESTORE TO VERSION analog) and the store-level
  * compensating multi-dataset transaction.
  */
class TransactionSpec extends SparkSpec {

  implicit val strOrd: Ordering[String] = Ordering.String
  private val idx: Indexer[String] =
    Indexer.of[String](1)(k => Seq(Seq(k)))(l =>
      if (l.head.size == 1) Some(l.head.head) else None)

  private def mkStore(prefix: String): Store[String] =
    new Store(spark, tmpDir(prefix), idx)

  private def load(ds: OrderedDataset, from: Int, until: Int): Unit =
    ds.write(spark.range(from, until).toDF("seq")
        .withColumn("v", col("seq") * 2.0),
      WriteOpts("seq", NRows(100))): Unit

  test("restoreTo reverts content as a new monotonic generation") {
    val st = mkStore("txn-restore")
    val ds = st.get("a")
    load(ds, 0, 500)
    val g1 = ds.meta.generation
    load(ds, 500, 900)
    assert(ds.df.count() === 900)
    val gAfter = ds.meta.generation
    ds.restoreTo(g1)
    assert(ds.df.count() === 500)
    assert(ds.meta.generation === gAfter + 1) // history never rewritten
    // the undone generation stays addressable while its files live
    assert(ds.dfAsOf(gAfter).count() === 900)
    // writes after a restore use fresh file ids (no reuse conflicts)
    load(ds, 500, 700)
    assert(ds.df.count() === 700)
    assert(ds.meta.files.map(_.id).distinct.size === ds.meta.files.size)
  }

  test("restoreTo to current generation is a no-op") {
    val st = mkStore("txn-noop")
    val ds = st.get("a")
    load(ds, 0, 300)
    val g = ds.meta.generation
    ds.restoreTo(g)
    assert(ds.meta.generation === g)
    assert(ds.df.count() === 300)
  }

  test("restore to a vacuumed generation fails loudly") {
    val st = mkStore("txn-vacuumed")
    val ds = st.get("a")
    load(ds, 0, 500)
    val g1 = ds.meta.generation
    // rewrite everything, then reap retirees immediately
    ds.write(spark.range(0, 500).toDF("seq")
        .withColumn("v", col("seq") * 3.0),
      WriteOpts("seq", NRows(100), duplicatesOn = Some(Nil))): Unit
    ds.vacuum(0L): Unit
    val e = intercept[IllegalArgumentException](ds.restoreTo(g1))
    assert(e.getMessage.contains("vacuum") ||
      e.getMessage.contains("not retained"))
  }

  test("transaction commits all on success") {
    val st = mkStore("txn-ok")
    st.transaction(Seq("corpus", "index")) { ds =>
      load(ds("corpus"), 0, 400)
      load(ds("index"), 0, 100)
    }
    assert(st.get("corpus").df.count() === 400)
    assert(st.get("index").df.count() === 100)
    assert(st.keys.toSeq === Seq("corpus", "index"))
  }

  test("transaction failure reverts updates and removes creations") {
    val st = mkStore("txn-fail")
    val corpus = st.get("corpus")
    load(corpus, 0, 400)
    val g0 = corpus.meta.generation
    val boom = intercept[RuntimeException] {
      st.transaction(Seq("corpus", "index")) { ds =>
        load(ds("corpus"), 400, 800) // committed, then must revert
        load(ds("index"), 0, 100)    // created, then must vanish
        throw new RuntimeException("ingest validation failed")
      }
    }
    assert(boom.getMessage === "ingest validation failed")
    assert(corpus.df.count() === 400)
    assert(corpus.meta.generation > g0) // revert is a new commit
    assert(!st.get("index").exists)
    assert(st.keys.toSeq === Seq("corpus"))
    // the store is fully writable afterwards
    load(corpus, 400, 500)
    assert(corpus.df.count() === 500)
  }

  test("transaction leaves untouched datasets alone on failure") {
    val st = mkStore("txn-untouched")
    load(st.get("a"), 0, 200)
    val g = st.get("a").meta.generation
    intercept[RuntimeException] {
      st.transaction(Seq("a", "b")) { _ =>
        throw new RuntimeException("nothing happened yet")
      }
    }
    assert(st.get("a").meta.generation === g)
    assert(!st.get("b").exists)
  }

  test("rollback reports a pre-existing dataset the body deleted") {
    val st = mkStore("txn-deleted")
    load(st.get("a"), 0, 200)
    val boom = intercept[IllegalStateException] {
      st.transaction(Seq("a")) { ds =>
        ds("a").removeFromDisk()
        throw new RuntimeException("body failed after the delete")
      }
    }
    // NOT a silent "fully reverted": the dataset is gone and the
    // caller is told so (with the unrecoverable generation number)
    assert(boom.getMessage.contains("rollback INCOMPLETE"))
    assert(boom.getMessage.contains("dataset was removed"))
    assert(boom.getCause.getMessage === "body failed after the delete")
    assert(!st.get("a").exists)
  }
}
