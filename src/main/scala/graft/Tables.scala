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

  /** Inferred-schema memo keyed on path + file size/mtime fingerprint:
    * `spark.read.parquet` without an explicit schema runs a small
    * footer-reading JOB per call, and the query surface loads these
    * tables hundreds of times per bench session (~30-50 ms each,
    * measured as the `parquet at Tables.scala` job leading every
    * query). The fingerprint makes a driver-regenerated table re-infer
    * instead of serving a stale schema — same discipline as the
    * pipeline fixtures' inputTag. Schema metadata only; every query
    * still computes from the parquet bytes. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[
      String, org.apache.spark.sql.types.StructType]

  /** Hadoop-FS fingerprint (VERDICT r14 #3): the old `java.io.File`
    * form silently degraded to a constant `"path|0:0"` on any
    * non-local filesystem (isDirectory = false there), losing the
    * staleness discipline without an error. The Hadoop API resolves
    * whatever scheme the path carries, recurses into partition
    * subdirectories (nested part files were invisible before), and
    * throws a real IOException on an unreadable directory instead of
    * the `listFiles() == null` NPE (ADVICE r14). Spark part-file
    * names embed a fresh UUID per write, so a regenerated table
    * changes the fingerprint even within one mtime tick. */
  private def fingerprint(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def list(dir: org.apache.hadoop.fs.Path): Seq[String] = {
      val sts = fs.listStatus(dir)
      sts.sortBy(_.getPath.getName).toSeq.flatMap { st =>
        if (st.isDirectory)
          list(st.getPath).map(e => s"${st.getPath.getName}/$e")
        else Seq(
          s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
      }
    }
    val parts =
      try {
        val st = fs.getFileStatus(p)
        if (st.isDirectory) list(p).mkString(",")
        else s"${st.getLen}:${st.getModificationTime}"
      } catch {
        // a missing path must not abort here: inference below raises
        // the standard, clearer PATH_NOT_FOUND analysis error
        case _: java.io.FileNotFoundException => "missing"
      }
    s"$path|$parts"
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    configure(spark)
    val path = s"$sfDir/$name.parquet"
    val schema = schemaCache.computeIfAbsent(fingerprint(spark, path),
      _ => spark.read.parquet(path).schema)
    spark.read.schema(schema).parquet(path)
  }

  /** Normalize a timestamp column to µs TIMESTAMP_NTZ, whatever the
    * parquet physical type: int64 nanos (TIMESTAMP(NANOS) via
    * nanosAsLong — the original driver schema), µs NTZ (regenerated
    * testdata reads natively under timestampType=TIMESTAMP_NTZ), or a
    * session-tz TIMESTAMP (cast preserves the wall clock under the
    * forced-UTC session). Schema drift in driver-regenerated testdata
    * must not break the adapter.
    */
  private def nanosToNtz(df: DataFrame, c: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema(c).dataType match {
      case LongType =>
        df.withColumn(c,
          timestamp_micros(expr(s"$c div 1000")).cast("timestamp_ntz"))
      case TimestampNTZType => df
      case TimestampType =>
        df.withColumn(c, col(c).cast("timestamp_ntz"))
      case other => throw new IllegalStateException(
        s"unsupported type for timestamp column '$c': $other")
    }
  }

  /** Same normalization to a session-tz µs TIMESTAMP (what Structured
    * Streaming watermarks want). */
  def toLtzMicros(df: DataFrame, c: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema(c).dataType match {
      case LongType =>
        df.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
      case TimestampType => df
      case TimestampNTZType =>
        // the TYPE OBJECT, not cast("timestamp"): under the session's
        // timestampType=TIMESTAMP_NTZ the parser resolves the string
        // "timestamp" back to NTZ and the cast is a no-op
        df.withColumn(c, col(c).cast(TimestampType))
      case other => throw new IllegalStateException(
        s"unsupported type for timestamp column '$c': $other")
    }
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

  /** events with a time-range predicate applied to the SCAN-NATIVE
    * column type BEFORE any conversion, so it reaches the parquet
    * reader: on the int64-nanos physical schema a predicate on the
    * converted column (`timestamp_micros(ts div 1000)`) cannot push
    * down, so the bound is applied to the raw int64 (exact — the data
    * is µs-aligned); on the native µs-NTZ schema a plain NTZ literal
    * comparison pushes down as-is. Bounds in epoch micros, [lo, hiExcl).
    */
  def eventsRange(s: SparkSession, d: String, loUs: Option[Long],
      hiUs: Option[Long]): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    var raw = load(s, d, "events")
    if (raw.schema("ts").dataType == LongType) {
      loUs.foreach(us => raw = raw.filter(col("ts") >= us * 1000L))
      hiUs.foreach(us => raw = raw.filter(col("ts") < us * 1000L))
      nanosToNtz(raw, "ts")
    } else {
      raw = nanosToNtz(raw, "ts")
      def ntzLit(us: Long) =
        timestamp_micros(lit(us)).cast("timestamp_ntz")
      loUs.foreach(us => raw = raw.filter(col("ts") >= ntzLit(us)))
      hiUs.foreach(us => raw = raw.filter(col("ts") < ntzLit(us)))
      raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
