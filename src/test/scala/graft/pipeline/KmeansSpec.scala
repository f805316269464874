package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Distributed k-means: the decimal-exact Lloyd step and the training
  * loop recover planted clusters from a poor deterministic init, and
  * the step is invariant to input partitioning.
  */
class KmeansSpec extends SparkSpec {
  import spark.implicits._

  // 3 planted clusters in 4-d: centers far apart, members jittered
  // deterministically; ids are arranged so the id-subset init picks
  // one member of each cluster (id % 40 == 0 && id < 120 → 0, 40, 80)
  private def planted() = {
    val centers = Seq(
      Seq(10.0, 0.0, 0.0, 0.0),
      Seq(0.0, 10.0, 0.0, 0.0),
      Seq(0.0, 0.0, 10.0, 0.0))
    (0L until 120L).map { i =>
      val c = (i / 40L).toInt
      val jit = (d: Int) => ((i * 7 + d * 3) % 5) * 0.1
      (i, centers(c).zipWithIndex.map { case (x, d) => x + jit(d) })
    }.toDF("id", "vec")
      .withColumn("vec", col("vec").cast("array<double>"))
      .withColumn("norm",
        sqrt(aggregate(col("vec"), lit(0.0), (a, x) => a + x * x)))
  }

  test("training recovers planted clusters; assignment is the plant") {
    val v = planted()
    val trained = SimilarityOps.kmeansTrain(v,
      col("id") % 40 === 0 && col("id") < 120, iters = 3)
    assert(trained.count() === 3)
    // every vector assigns to the centroid of its planted cluster
    val assigned = SimilarityOps.ivfAssignTo(v, trained)
      .select(col("id"), col("cid")).as[(Long, Long)].collect()
    val byPlant = assigned.groupBy(_._1 / 40).view
      .mapValues(_.map(_._2).distinct.toSeq).toMap
    assert(byPlant.values.forall(_.size == 1),
      s"mixed assignment: $byPlant")
    assert(byPlant.values.flatten.toSet.size === 3)
    // centroids sit near the planted centers (jitter mean = 0.2)
    val cents = trained.select("vec").as[Seq[Double]].collect()
    assert(cents.forall(c => c.exists(_ > 9.0)))
  }

  test("a trained quantizer serves a store-backed IVF index") {
    val v = planted()
    val trained = SimilarityOps.kmeansTrain(v,
      col("id") % 40 === 0 && col("id") < 120, iters = 3)
    val dir = tmpDir("ivf-trained") + "/idx"
    IvfIndex.buildWith(spark, dir, v, trained)
    // probing ONE list per query suffices: the trained quantizer puts
    // every planted-cluster member in the query's own list
    val queries = v.filter(col("id").isin(5L, 45L, 85L))
    val res = IvfIndex.search(spark, dir, queries, trained,
      nProbe = 1, k = 5)
    import spark.implicits._
    val byQ = res.select("q_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(byQ.keySet === Set(5L, 45L, 85L))
    byQ.foreach { case (q, hits) =>
      assert(hits.size === 5)
      assert(hits.forall(h => h / 40 == q / 40),
        s"query $q matched outside its planted cluster: $hits")
    }
  }

  test("the step is partitioning-invariant (decimal-exact means)") {
    val v = planted()
    val a = SimilarityOps.kmeansStep(v, v.filter(col("id") % 40 === 0))
      .orderBy("cid", "dim").collect().toSeq
    val b = SimilarityOps.kmeansStep(v.repartition(13),
        v.filter(col("id") % 40 === 0))
      .orderBy("cid", "dim").collect().toSeq
    assert(a === b)
  }
}
