package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq(
    (1L, 10L, "k1"), (2L, 20L, "k1"), (3L, 30L, "k1"),
    (4L, 15L, "k2"), (5L, 5L, "k3"))
    .toDF("id", "ts", "key")
  private val right = Seq(
    (10L, "k1", "a"), (20L, "k1", "b"), (25L, "k1", "c"),
    (99L, "k2", "z"))
    .toDF("ts", "key", "state")

  test("backward: latest right at-or-before, ties attach, nulls if none") {
    val out = AsofJoin.backward(left, right, Seq("key"), "ts",
      Seq("state"))
      .select("id", "state").as[(Long, Option[String])].collect().toMap
    assert(out(1L).contains("a"))  // tie at ts=10 attaches
    assert(out(2L).contains("b"))
    assert(out(3L).contains("c"))  // latest of {a,b,c}
    assert(out(4L).isEmpty)        // k2 mark is later
    assert(out(5L).isEmpty)        // k3 has no marks
  }

  test("forward: earliest right at-or-after") {
    val out = AsofJoin.forward(left, right, Seq("key"), "ts",
      Seq("state"))
      .select("id", "state").as[(Long, Option[String])].collect().toMap
    assert(out(1L).contains("a"))  // tie attaches forward too
    assert(out(2L).contains("b"))
    assert(out(3L).isEmpty)        // nothing at-or-after 30
    assert(out(4L).contains("z"))
    assert(out(5L).isEmpty)
  }

  test("null timestamps never fabricate matches (either side)") {
    val l = Seq((1L, Some(5L), "k1"), (2L, None, "k1"))
      .toDF("id", "ts", "key")
    val r = Seq((Option.empty[Long], "k1", "ghost"),
      (Some(20L), "k1", "real"))
      .toDF("ts", "key", "state")
    // backward: a null-ts right row sorts first under asc ordering —
    // without the filter it would attach to every left row
    val back = AsofJoin.backward(l, r, Seq("key"), "ts", Seq("state"))
      .select("id", "state").as[(Long, Option[String])].collect().toMap
    assert(back(1L).isEmpty) // only candidates: ghost(null), real(20>5)
    assert(back(2L).isEmpty) // null-ts left row: no defined match
    // forward: null-ts left sorts last under desc ordering — it would
    // otherwise see every right row
    val fwd = AsofJoin.forward(l, r, Seq("key"), "ts", Seq("state"))
      .select("id", "state").as[(Long, Option[String])].collect().toMap
    assert(fwd(1L).contains("real"))
    assert(fwd(2L).isEmpty)
  }

  test("null join keys never match (equi-key semantics)") {
    // DuckDB `ASOF JOIN ... ON l.key = r.key AND l.ts >= r.ts` never
    // matches null keys; the null-key window partition must not either
    val l = Seq((1L, 5L, Option.empty[String]), (2L, 5L, Some("k1")))
      .toDF("id", "ts", "key")
    val r = Seq((3L, Option.empty[String], "nullk"), (4L, Some("k1"), "real"))
      .toDF("ts", "key", "state")
    val back = AsofJoin.backward(l, r, Seq("key"), "ts", Seq("state"))
      .select("id", "state").as[(Long, Option[String])].collect().toMap
    assert(back(1L).isEmpty)         // null-key left attaches nothing
    assert(back(2L).contains("real"))
  }

  test("left row count and columns are preserved exactly") {
    val out = AsofJoin.backward(left, right, Seq("key"), "ts",
      Seq("state"))
    assert(out.count() == left.count())
    assert(out.columns.toSeq == Seq("id", "ts", "key", "state"))
    // attach-name collision is rejected
    val err = intercept[IllegalArgumentException] {
      AsofJoin.backward(left, right.withColumnRenamed("state", "key"),
        Seq("key"), "ts", Seq("key"))
    }
    assert(err.getMessage.contains("collide"))
  }
}
