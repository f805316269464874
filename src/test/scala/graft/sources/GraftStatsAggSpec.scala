package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.store.{NRows, OrderedDataset, WriteOpts}

class GraftStatsAggSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = tmpDir("statsagg") + "/ds"
    val df = spark.range(1000).toDF("seq")
      .withColumn("v", col("seq") * 2.0)
      .withColumn("name", concat(lit("row"), col("seq")))
    new OrderedDataset(spark, d).write(df, WriteOpts("seq", NRows(100)))
    GraftStatsAgg.register(spark)
    d
  }

  // count at the optimized-logical level: AQE wraps the physical plan,
  // hiding FileSourceScanExec from a naive collect
  private def scans(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l
    }.size

  private def isMetadataOnly(df: DataFrame): Boolean =
    scans(df) == 0 && df.queryExecution.optimizedPlan.collectFirst {
      case l: LocalRelation => l
    }.nonEmpty

  test("whole-relation count/min/max answered from the sidecar") {
    val t = GraftSource.table(spark, dir)
    val q = t.agg(
      count(lit(1)).as("n"),
      min("seq").as("mn"), max("seq").as("mx"),
      min("v").as("vmn"), max("v").as("vmx"))
    assert(isMetadataOnly(q), q.queryExecution.optimizedPlan.toString)
    val r = q.head()
    assert(r.getLong(0) === 1000L)
    assert(r.getLong(1) === 0L && r.getLong(2) === 999L)
    assert(r.getDouble(3) === 0.0 && r.getDouble(4) === 1998.0)
  }

  test("SQL over a USING graft view is metadata-only too") {
    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY VIEW stats_v
          USING graft OPTIONS (path '$dir')""")
    val q = spark.sql(
      "SELECT count(*) AS n, max(seq) AS mx FROM stats_v")
    assert(isMetadataOnly(q))
    assert(q.head() === org.apache.spark.sql.Row(1000L, 999L))
  }

  test("anything the stats cannot answer exactly falls back to the scan") {
    val t = GraftSource.table(spark, dir)
    // WHERE on a non-ordered column: stats can't verify coverage
    // (ordered-column ranges are handled by the hybrid count rewrite)
    assert(scans(t.filter(col("v") < 100).agg(count(lit(1)))) === 1)
    // COUNT(col): non-null counts aren't tracked
    assert(scans(t.agg(count(col("v")))) === 1)
    // string min/max: stats are prefix-truncated, not exact values
    assert(scans(t.agg(min("name"))) === 1)
    // DISTINCT
    assert(scans(t.agg(countDistinct(col("seq")))) === 1)
    // grouped aggregate
    assert(scans(t.groupBy(col("seq") % 2).agg(count(lit(1)))) === 1)
    // and the fallbacks still compute the right values
    assert(t.filter(col("v") < 100).count() === 50)
    assert(t.agg(min("name")).head().getString(0) === "row0")
  }

  test("no-stats columns bail; mixed answerable/unanswerable bails whole") {
    val d2 = tmpDir("statsagg2") + "/ds"
    val df = spark.range(100).toDF("seq").withColumn("v", col("seq") * 1.5)
    new OrderedDataset(spark, d2)
      .write(df, WriteOpts("seq", NRows(50), colStats = false))
    val t = GraftSource.table(spark, d2)
    // v has no sidecar stats -> the whole aggregate runs as a scan
    val q = t.agg(count(lit(1)).as("n"), max("v").as("vmx"))
    assert(scans(q) === 1)
    assert(q.head() === org.apache.spark.sql.Row(100L, 148.5))
    // but the ordered column alone is still metadata-only
    assert(isMetadataOnly(t.agg(count(lit(1)), min("seq"), max("seq"))))
  }

  test("range COUNT: covered files from the sidecar, boundary files scanned") {
    val t = GraftSource.table(spark, dir)
    val q = t.filter(col("seq") >= 250 && col("seq") < 750)
      .agg(count(lit(1)).as("n"))
    assert(q.head().getLong(0) === 500L)
    // the plan's only relation is the RESTRICTED index over the two
    // boundary files — the four covered files never enter the scan
    val scanned = q.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation =>
        l.relation.asInstanceOf[
          org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.inputFiles.length
    }
    assert(scanned === Seq(2), q.queryExecution.optimizedPlan.toString)
  }

  test("file-aligned range COUNT is pure metadata (no scan at all)") {
    val t = GraftSource.table(spark, dir)
    val q = t.filter(col("seq") >= 200 && col("seq") < 700)
      .agg(count(lit(1)).as("n"))
    assert(isMetadataOnly(q), q.queryExecution.optimizedPlan.toString)
    assert(q.head().getLong(0) === 500L)
    // one-sided + strict variants
    val q2 = t.filter(col("seq") > 799).agg(count(lit(1)))
    assert(q2.head().getLong(0) === 200L)
    val q3 = t.filter(col("seq") === 500).agg(count(lit(1)))
    assert(q3.head().getLong(0) === 1L)
  }

  test("range MIN/MAX go hybrid too; covered stats are exact") {
    val t = GraftSource.table(spark, dir)
    // one boundary file scanned; min comes from it, max from metadata
    val q = t.filter(col("seq") >= 250).agg(
      min("seq").as("mn"), max("seq").as("mx"),
      min("v").as("vmn"), count(lit(1)).as("n"))
    val scanned = q.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation =>
        l.relation.asInstanceOf[
          org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.inputFiles.length
    }
    assert(scanned === Seq(1), q.queryExecution.optimizedPlan.toString)
    assert(q.head() === org.apache.spark.sql.Row(250L, 999L, 500.0, 750L))
    // file-aligned range: pure metadata even with min/max in the mix
    val q2 = t.filter(col("seq") >= 200 && col("seq") < 700).agg(
      count(lit(1)).as("n"), min("seq"), max("v"))
    assert(isMetadataOnly(q2))
    assert(q2.head() === org.apache.spark.sql.Row(500L, 200L, 1398.0))
    // a fully-missed range answers count 0 / null extremes, no scan
    val q3 = t.filter(col("seq") > 100000).agg(count(lit(1)), max("seq"))
    assert(isMetadataOnly(q3))
    assert(q3.head() === org.apache.spark.sql.Row(0L, null))
  }

  test("range rewrite bails on non-ordered conjuncts and string extremes") {
    val t = GraftSource.table(spark, dir)
    // extra conjunct on a secondary column: stats can't verify coverage
    val q = t.filter(col("seq") >= 250 && col("seq") < 750 &&
      col("v") >= 0).agg(count(lit(1)))
    assert(scans(q) === 1)
    assert(q.head().getLong(0) === 500L)
    // string min under a range: prefix-truncated stats can't answer
    val q2 = t.filter(col("seq") >= 250).agg(min("name"))
    val full = q2.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation =>
        l.relation.asInstanceOf[
          org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.inputFiles.length
    }
    assert(full === Seq(10)) // unrestricted relation — no rewrite
    assert(q2.head().getString(0) === "row250")
  }

  test("results match the scan-based plan exactly") {
    val t = GraftSource.table(spark, dir)
    val viaStats = t.agg(count(lit(1)), min("seq"), max("v")).head()
    val viaScan = spark.read
      .parquet(new OrderedDataset(spark, dir).meta.files
        .map(f => s"$dir/${f.name}"): _*)
      .agg(count(lit(1)), min("seq"), max("v")).head()
    assert(viaStats === viaScan)
  }
}
