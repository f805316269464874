package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md) plus the
  * session configuration needed for oracle parity with DuckDB.
  *
  * DuckDB reads the pandas-written parquet as *naive* (no-timezone)
  * timestamps; Spark's default `TimestampType` is session-tz-adjusted, which
  * would surface as `timestamp[us, tz=UTC]` in the verify output vs DuckDB's
  * naive `timestamp[us]`. We therefore force `TIMESTAMP_NTZ` inference and
  * micros parquet output so both sides produce byte-identical values.
  */
object Tables {

  /** Runtime confs safe to set on an externally-built session. */
  def configure(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.timestampType", "TIMESTAMP_NTZ")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // events.ts is TIMESTAMP(NANOS) which Spark cannot read natively;
    // read the raw int64 nanos and convert in the loader. The data's ns
    // components are all multiples of 1000, so µs truncation is lossless.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    configure(spark)
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Convert an int64-nanos column (from nanosAsLong) to µs TIMESTAMP_NTZ. */
  private def nanosToNtz(df: DataFrame, c: String): DataFrame = {
    import org.apache.spark.sql.functions._
    df.withColumn(c,
      timestamp_micros(expr(s"$c div 1000")).cast("timestamp_ntz"))
  }

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame =
    nanosToNtz(load(s, d, "events"), "ts")

  /** events with a time-range predicate applied to the RAW int64-nanos
    * column BEFORE the timestamp conversion: a predicate on the
    * converted column (`timestamp_micros(ts div 1000)`) cannot be pushed
    * into the parquet scan, one on the raw int64 prunes row groups via
    * min/max stats. Exact because the data is µs-aligned. Bounds in
    * epoch micros, [lo, hiExcl).
    */
  def eventsRange(s: SparkSession, d: String, loUs: Option[Long],
      hiUs: Option[Long]): DataFrame = {
    import org.apache.spark.sql.functions.col
    var raw = load(s, d, "events")
    loUs.foreach(us => raw = raw.filter(col("ts") >= us * 1000L))
    hiUs.foreach(us => raw = raw.filter(col("ts") < us * 1000L))
    nanosToNtz(raw, "ts")
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
