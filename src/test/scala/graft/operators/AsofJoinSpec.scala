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
