package graft

import org.apache.spark.sql.functions._

/** The schema-inference memo (r14 optimization): inference runs once
  * per (path, file sizes+mtimes) fingerprint, and a table regenerated
  * in place — even with a DIFFERENT schema — re-infers instead of
  * serving the stale cached schema. */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  test("schema memo serves repeats and invalidates on file change") {
    val d = tmpDir("graft_tables_spec")
    val path = s"$d/doctest.parquet"
    Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(path)
    val first = Tables.load(spark, d, "doctest")
    assert(first.schema.fieldNames.toSeq == Seq("doc_id", "text"))
    assert(first.count() == 2)
    // repeat load: same schema object semantics, same rows
    assert(Tables.load(spark, d, "doctest").schema == first.schema)
    // regenerate IN PLACE with a different schema — no mtime-settling
    // sleep: Spark part-file names embed a fresh UUID per write, so
    // the fingerprint must move even within one mtime tick (the r14
    // test papered over this with Thread.sleep(1100); ADVICE r14)
    Seq((1L, "a", 0.5)).toDF("doc_id", "text", "w")
      .coalesce(1).write.mode("overwrite").parquet(path)
    val second = Tables.load(spark, d, "doctest")
    assert(second.schema.fieldNames.toSeq == Seq("doc_id", "text", "w"),
      "stale cached schema served after the table was regenerated")
    assert(second.select(sum(col("w"))).as[Double].head() == 0.5)
  }

  test("fingerprint works through a file:-scheme Hadoop path and " +
      "sees nested partition files") {
    // VERDICT r14 #3: the java.io.File fingerprint degraded to a
    // constant on any non-local scheme. Regenerating a PARTITIONED
    // table through an explicit file: URI must re-infer.
    val d = "file:" + tmpDir("graft_tables_hfs")
    val path = s"$d/parttest.parquet"
    Seq((1L, "a", 0)).toDF("doc_id", "text", "k")
      .write.mode("overwrite").partitionBy("k").parquet(path)
    val first = Tables.load(spark, d, "parttest")
    assert(first.schema.fieldNames.contains("text"))
    Seq((1L, "a", 0.5, 0)).toDF("doc_id", "text", "w", "k")
      .write.mode("overwrite").partitionBy("k").parquet(path)
    val second = Tables.load(spark, d, "parttest")
    assert(second.schema.fieldNames.contains("w"),
      "stale cached schema served for a file:-scheme partitioned table")
  }
}
