package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BaseJoinExec}

/** Plan-shape pin for [[ContaminationOps.fuzzyOverlap]]'s scale claim
  * (SCALE.md r14e, README): candidate generation must join the TRAIN
  * side's banded signatures against a BROADCAST eval band table —
  * train-side work stays map-side (no exchange, no other join) until
  * candidates exist. The claim is what makes the screen viable at
  * 100 TB; a refactor that drops the broadcast (or sneaks a shuffle
  * under the band join) must fail here, not in an audit paragraph.
  * AQE is disabled inside the test so the physical tree is directly
  * inspectable (query-stage wrappers hide subtrees from collect);
  * the explicit `broadcast()` hint plans the same join either way.
  */
class FuzzyScreenShapeSpec extends SparkSpec {
  import spark.implicits._

  test("fuzzyOverlap candidate join: eval bands broadcast, train " +
      "side shuffle-free and join-free beneath it") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val train = (0L until 50L).map(i =>
        (i, s"alpha beta gamma doc $i delta epsilon zeta eta theta"))
        .toDF("doc_id", "text")
      val eval = Seq((900L, "alpha beta gamma doc 7 delta epsilon " +
        "zeta eta theta")).toDF("doc_id", "text")
      val out = ContaminationOps.fuzzyOverlap(train, eval, "doc_id",
        "text", 3, 12, 4, 0.5)
      assert(out.count() >= 1L, "the planted leak must be flagged")
      val plan = out.queryExecution.executedPlan
      val bandJoins = plan.collect {
        case b: BroadcastHashJoinExec
            if (b.leftKeys ++ b.rightKeys).exists(
              _.references.exists(_.name == "band_id")) => b
      }
      assert(bandJoins.size == 1,
        s"expected exactly one broadcast band join, got " +
          s"${bandJoins.size} in:\n$plan")
      val streamed: SparkPlan = bandJoins.head.buildSide match {
        case org.apache.spark.sql.catalyst.optimizer.BuildRight =>
          bandJoins.head.left
        case _ => bandJoins.head.right
      }
      assert(streamed.collect { case s: ShuffleExchangeExec => s }.isEmpty,
        s"train side must reach the candidate join without an " +
          s"exchange:\n$streamed")
      assert(streamed.collect { case j: BaseJoinExec => j }.isEmpty,
        s"train side must be pure projections beneath the candidate " +
          s"join:\n$streamed")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
