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
    // regenerate IN PLACE with a different schema; ensure the mtime
    // moves even on coarse-grained filesystems
    Thread.sleep(1100)
    Seq((1L, "a", 0.5)).toDF("doc_id", "text", "w")
      .coalesce(1).write.mode("overwrite").parquet(path)
    val second = Tables.load(spark, d, "doctest")
    assert(second.schema.fieldNames.toSeq == Seq("doc_id", "text", "w"),
      "stale cached schema served after the table was regenerated")
    assert(second.select(sum(col("w"))).as[Double].head() == 0.5)
  }
}
