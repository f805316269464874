package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.agg.{AggFn, AggSpec}
import graft.store._
import graft.stream.{AggStream, StreamKeyCfg}
import graft.streaming.{StreamingAgg, StreamingXRows}

/** Queries exercising the store layer end-to-end: ordered upsert with
  * keep-last dedup (M1-M6, W1), zone-map-pruned range scans (S2), the
  * synchronized multi-dataset range scan (W3-W4), and the restartable
  * incremental aggregation (T1-T9) — each with a DuckDB oracle that
  * recomputes the same semantics relationally from the raw events table.
  *
  * Store state is built once per scale factor under /tmp (idempotent,
  * marker-file-guarded) so Verify and Bench can call queries repeatedly.
  */
object StoreQueries {

  implicit val strOrd: Ordering[String] = Ordering.String
  private val idx: Indexer[String] =
    Indexer.of[String](1)(k => Seq(Seq(k)))(l =>
      if (l.head.size == 1) Some(l.head.head) else None)

  private def slug(sfDir: String): String =
    sfDir.replaceAll("[^a-zA-Z0-9]", "_")

  private def baseDir(sfDir: String) = s"/tmp/graft_store_${slug(sfDir)}"

  private def ev5(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select("event_id", "ts", "user_id", "event_type", "value")

  private def tsAt(y: Int, mo: Int, day: Int): OrdTs =
    OrdTs(java.time.LocalDateTime.of(y, mo, day, 0, 0)
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L)

  val aggSpecs = Seq(
    AggSpec("first_v", "value", AggFn.First),
    AggSpec("last_v", "value", AggFn.Last),
    AggSpec("min_v", "value", AggFn.Min),
    AggSpec("max_v", "value", AggFn.Max),
    AggSpec("sum_v", "value", AggFn.Sum))

  /** Fingerprint of the events input (path + size + mtime per file):
    * driver-regenerated testdata changes the tag, so a cached fixture
    * built from the OLD data can never pass for current (the round-4
    * regen changed the events schema in place — a version bump alone
    * would not have caught it). */
  private def inputTag(d: String): String = {
    val f = new java.io.File(s"$d/events.parquet")
    val parts =
      if (f.isDirectory)
        f.listFiles().sortBy(_.getName)
          .map(p => s"${p.getName}:${p.length}:${p.lastModified}")
      else Array(s"${f.getName}:${f.length}:${f.lastModified}")
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(s"$d|${parts.mkString("|")}".getBytes("UTF-8"))
    md.digest().take(6).map("%02x".format(_)).mkString
  }

  /** Build all store fixtures for a scale factor (idempotent). */
  def ensure(s: SparkSession, d: String): Store[String] = synchronized {
    val base = baseDir(d)
    val st = new Store(s, base, idx)
    // version-suffixed + input-fingerprinted: bump the version when the
    // fixture set changes; the tag catches regenerated input data
    // v11: + the clustered dataset (m11) and the stream_src dataset
    // with its graft-source streaming aggregation (t14)
    // v12: clicks carries per-file HLL sketches (s7)
    // v13: + the sink_ds dataset fed through the native graft
    // streaming sink (t15)
    // v14: + native-streaming count bins over the graft source (t16)
    // v15: + per-key (event_type) streaming count bins — the count-bin
    // scale-out path (t17)
    val marker = new java.io.File(s"$base/_BUILT_v15_${inputTag(d)}")
    if (marker.exists()) return st
    // wipe any partial build
    graft.LocalFs.rmTree(new java.io.File(base))
    val e = ev5(s, d)

    // m6 upsert fixture: initial load (event_id % 10 != 0), then an
    // overlapping correction batch (event_id % 3 == 0, value + 1000)
    // deduped keep-last on ts.
    val up = st.get("upsert")
    up.write(e.filter(col("event_id") % 10 =!= 0),
      WriteOpts("ts", NRows(2000)))
    up.write(
      e.filter(col("event_id") % 3 === 0)
        .withColumn("value", col("value") + 1000.0),
      WriteOpts("ts", NRows(2000), duplicatesOn = Some(Seq("ts")),
        maxNOffTargetRgs = Some(4)))

    // per-type datasets for pruned scans + synchronized iteration
    st.get("clicks").write(e.filter(col("event_type") === "click"),
      WriteOpts("ts", NRows(1000),
        sketchCols = Seq("user_id", "event_id")))
    st.get("purchases").write(e.filter(col("event_type") === "purchase"),
      WriteOpts("ts", NRows(1000)))

    // t3 fixture: AggStream over three seed chunks with a restart between
    // them (a fresh AggStream instance resuming from persisted state)
    val mk = () => new AggStream(st, "ts", "event_id",
      Map(
        "hourly" -> StreamKeyCfg(None, "1 hour", aggs = aggSpecs),
        // T6: day bins observed at 6-hour snapshot points, incremental
        "daily_snap" -> StreamKeyCfg(None, "1 day", aggs = aggSpecs,
          snapFreq = Some("6 hours")),
        // G3 incrementally: 500-row count bins continuing across chunks
        "xrows" -> StreamKeyCfg(None, "", aggs = aggSpecs,
          xRows = Some(500)),
        // snap_by composed with by_x_rows (ref segmentby.py:712-1028):
        // 500-row bins observed at 12-hour snapshot points
        "xrows_snap" -> StreamKeyCfg(None, "", aggs = aggSpecs,
          snapFreq = Some("12 hours"), xRows = Some(500)),
        // sparse filtered key for empty-snapshot forwarding (T6
        // preserve_res in the incremental path): high-value purchases
        // leave most hourly cells of a day empty
        "purch_snap" -> StreamKeyCfg(
          Some(col("event_type") === "purchase" && col("value") > 180.0),
          "1 day", aggs = aggSpecs, snapFreq = Some("1 hour"))),
      NRows(5000))
    val chunks = Seq(
      e.filter(col("event_id") < 3000),
      e.filter(col("event_id") >= 3000 && col("event_id") < 6500),
      e.filter(col("event_id") >= 6500))
    mk().agg(chunks.take(2).iterator)   // stops mid-stream…
    mk().agg(chunks.drop(2).iterator)   // …and restarts from stored state

    // m7 fixture: range delete — full ordered load, then purge
    // [Jan 10, Jan 18): interior files dropped by a metadata-only
    // commit, the two boundary files rewritten.
    val purged = st.get("purged")
    purged.write(e, WriteOpts("ts", NRows(1000)))
    purged.delete(Some(tsAt(2024, 1, 10)), Some(tsAt(2024, 1, 18)))

    // m11 fixture: secondary clustering — full ordered load, then a
    // clustered re-layout on user_id (every file rewritten in place;
    // zone maps and content must survive the permutation).
    val clustered = st.get("clustered")
    clustered.write(e, WriteOpts("ts", NRows(1500)))
    clustered.optimize(NRows(1500), clusterBy = Seq("user_id")): Unit

    // m8 fixture: additive schema evolution — the initial load predates
    // the `user_id` column; a later evolved append carries it. Old
    // files serve it as null through the sidecar-schema read. The
    // split is capped to the corpus (min with half the max id): a
    // corpus smaller than the absolute 5000 cut would otherwise get an
    // EMPTY evolved append and user_id would never enter the schema
    // (found by a full bench at sf0.001; gated SFs all resolve to the
    // historical 5000, so their fixture content — and the v15
    // markers — are unchanged). The oracle expresses the same
    // LEAST(5000, max/2+1) rule.
    val evolveCut = math.min(5000L,
      e.agg(max("event_id")).head().getLong(0) / 2 + 1)
    val evolved = st.get("evolved")
    evolved.write(e.filter(col("event_id") < evolveCut).drop("user_id"),
      WriteOpts("ts", NRows(2000)))
    evolved.write(e.filter(col("event_id") >= evolveCut),
      WriteOpts("ts", NRows(2000), mergeSchema = true))

    // t8 fixture: the NATIVE Structured Streaming path — readStream over
    // the events parquet, event-time hourly windows in update mode,
    // foreachBatch keep-last upsert into the store (T2/T3 via the state
    // store + checkpoint instead of our batch-incremental machinery).
    val rawSchema = s.read.parquet(s"$d/events.parquet").schema
    // the streaming file source needs a DIRECTORY: point at the table
    // dir when events.parquet is Spark-written (ScaleData replicas),
    // else at the parent with a glob for the driver's single-file shape
    def eventsStream() = {
      val base = s.readStream.schema(rawSchema)
      if (new java.io.File(s"$d/events.parquet").isDirectory)
        base.parquet(s"$d/events.parquet")
      else base.option("pathGlobFilter", "events.parquet").parquet(d)
    }
    val seedStream = Tables.toLtzMicros(eventsStream(), "ts")
      .select("event_id", "ts", "value")
    val q = StreamingAgg.run(seedStream, "ts", "event_id", "1 hour",
      aggSpecs, s"$base/streaming_hourly", s"$base/_ckpt_t8",
      NRows(5000))
    q.awaitTermination()

    // t9 fixture: T6 natively — snapshot cells from a second streaming
    // pass (fresh readStream over the same source), day bins observed
    // at the 6-hour grid, read-time running combine.
    val seedStream2 = Tables.toLtzMicros(eventsStream(), "ts")
      .select("event_id", "ts", "value")
    val q2 = StreamingAgg.runSnapshots(seedStream2, "ts", "event_id",
      "1 day", "6 hours", aggSpecs, s"$base/streaming_snap",
      s"$base/_ckpt_t9", NRows(5000))
    q2.awaitTermination()

    // t14 fixture: the STORE ITSELF as the streaming source. The same
    // events rows are committed in three ordered appends to a graft
    // dataset; `readStream.format("graft")` tails it (generations are
    // the offsets, each commit's inserts one micro-batch) into the
    // same native hourly aggregation as t8 — so both must converge to
    // the identical oracle.
    val src = st.get("stream_src")
    src.write(e.filter(col("event_id") < 3000),
      WriteOpts("ts", NRows(2000)))
    src.write(e.filter(col("event_id") >= 3000 && col("event_id") < 6500),
      WriteOpts("ts", NRows(2000)))
    src.write(e.filter(col("event_id") >= 6500),
      WriteOpts("ts", NRows(2000)))
    val seedStream3 = s.readStream.format("graft")
      .load(st.dirOf("stream_src"))
      .withColumn("ts", col("ts").cast("timestamp_ltz"))
      .select("event_id", "ts", "value")
    val q3 = StreamingAgg.run(seedStream3, "ts", "event_id", "1 hour",
      aggSpecs, s"$base/stream_src_hourly", s"$base/_ckpt_t14",
      NRows(5000))
    q3.awaitTermination()

    // t16 fixture: native-streaming COUNT bins (G3/T1 in the state
    // store): the same 3-commit stream_src tailed through the graft
    // source; bins span the commit boundaries, the running ordinal
    // and open-bin partial live in flatMapGroupsWithState state.
    val seedStreamX = s.readStream.format("graft")
      .load(st.dirOf("stream_src"))
      .withColumn("ts", col("ts").cast("timestamp_ltz"))
      .select("event_id", "ts", "value")
    val qx = StreamingXRows.run(seedStreamX, "ts", "event_id", "value",
      500L, s"$base/streaming_xrows", s"$base/_ckpt_t16", NRows(5000))
    qx.awaitTermination()

    // t17 fixture: the documented count-bin SCALE-OUT path — the same
    // 3-commit stream, but bins maintained independently per
    // event_type (5 parallel sequential folds in the state store
    // instead of one global one); per-key ordinals span the commit
    // boundaries exactly like t16's global one.
    val seedStreamXK = s.readStream.format("graft")
      .load(st.dirOf("stream_src"))
      .withColumn("ts", col("ts").cast("timestamp_ltz"))
      .select("event_id", "ts", "event_type", "value")
    val qxk = StreamingXRows.runKeyed(seedStreamXK, "event_type", "ts",
      "event_id", "value", 300L, s"$base/streaming_xrows_keyed",
      s"$base/_ckpt_t17", NRows(5000))
    qxk.awaitTermination()

    // t15 fixture: the store as a NATIVE streaming SINK — the same
    // events rows arrive as micro-batches through
    // writeStream.format("graft") (exactly-once epoch stamps in the
    // sidecar kv); the sink dataset must read back as the full table.
    val seedStream4 = Tables.toLtzMicros(eventsStream(), "ts")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val q4 = seedStream4.writeStream.format("graft")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$base/_ckpt_t15")
      .option("ordered_on", "ts")
      .option("target_rows", "2000")
      .start(st.dirOf("sink_ds"))
    q4.awaitTermination()

    marker.getParentFile.mkdirs()
    marker.createNewFile()
    st
  }

  /** Sharded-store fixture: the SAME events rows value-range-sharded
    * across 4 keys by [[Store.shardedWrite]] (the growth path past the
    * per-dataset ≈19 TB stats ceiling). Separate base + marker so the
    * main v-numbered fixture set never rebuilds for it.
    */
  def ensureSharded(s: SparkSession, d: String): Store[String] =
    synchronized {
      val base = baseDir(d) + "_sharded"
      val st = new Store(s, base, idx)
      val marker = new java.io.File(s"$base/_BUILT_SHARD_v1_${inputTag(d)}")
      if (marker.exists()) return st
      graft.LocalFs.rmTree(new java.io.File(base))
      val e = ev5(s, d)
      val n = e.count()
      st.shardedWrite(e, WriteOpts("ts", NRows(20000)), i => s"shard$i",
        targetRowsPerShard = math.max(1L, math.ceil(n / 4.0).toLong)): Unit
      marker.getParentFile.mkdirs()
      marker.createNewFile(): Unit
      st
    }

  /** DuckDB-side events projection with µs timestamps. */
  private val EV =
    """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
                       event_type, value FROM events)"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // M1-M6: ordered upsert — full readback after overlap merge + dedup.
    "m6_upsert" -> { (s, d) =>
      val st = ensure(s, d)
      st.get("upsert").df
        .select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy("event_id")
    },

    // Time travel: the SAME dataset as m6_upsert, read at generation 1
    // (the state committed by the initial load, before the correction
    // upsert replaced its files) — Delta VERSION AS OF semantics from
    // retained sidecars + grace-retired data files.
    "m9_time_travel" -> { (s, d) =>
      val st = ensure(s, d)
      st.get("upsert").dfAsOf(1L)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy("event_id")
    },

    // Change feed (Delta CDF analog): row-level diff of the correction
    // upsert's commit — generation 1 (initial load) → generation 2
    // (live). Unchanged files are never read (driver file-list diff);
    // replaced-but-identical rows cancel in the exceptAll.
    "m10_change_feed" -> { (s, d) =>
      val st = ensure(s, d)
      st.get("upsert").changeFeed(1L, 2L)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"),
          col("_change_type").as("change_type"))
        .orderBy("change_type", "event_id", "ts")
    },

    // Clustered re-layout (Delta ZORDER analog, intra-file): content
    // must round-trip exactly through the permuting rewrite, with zone
    // maps intact — plus a range scan over the clustered dataset.
    "m11_clustered_readback" -> { (s, d) =>
      val st = ensure(s, d)
      val lo = tsAt(2024, 1, 8); val hi = tsAt(2024, 1, 20)
      st.get("clustered").rangeDF(Some(lo), Some(hi))
        .filter(col("user_id") === 7L)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy("event_id")
    },

    // M-family growth path: a corpus value-range-sharded across store
    // KEYS (Store.shardedWrite), read back through the key-pruned
    // union (rangeDFAcross) — shards whose recorded range misses the
    // query contribute zero-file scans, then per-file zone maps prune
    // within the covering shard(s).
    "m12_sharded_readback" -> { (s, d) =>
      val st = ensureSharded(s, d)
      st.rangeDFAcross(st.keys.toSeq,
          Some(tsAt(2024, 1, 10)), Some(tsAt(2024, 1, 20)))
        .select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy("event_id")
    },

    // S2: zone-map-pruned range scan from sidecar stats.
    "s2_pruned_scan" -> { (s, d) =>
      val st = ensure(s, d)
      val lo = OrdTs(java.time.LocalDateTime.of(2024, 1, 12, 0, 0)
        .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L)
      val hi = OrdTs(java.time.LocalDateTime.of(2024, 1, 22, 0, 0)
        .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L)
      st.get("clicks").rangeDF(Some(lo), Some(hi))
        .select("event_id", "ts", "user_id", "value")
        .orderBy("event_id")
    },

    // S1-S3 as a first-class Spark source: pure SQL over a
    // `USING graft` temp view — the GraftFileIndex prunes files from
    // the sidecar zone map off the SQL WHERE clause, then Spark's
    // parquet reader takes over (row-group pushdown, column pruning).
    "s3_sql_source" -> { (s, d) =>
      val st = ensure(s, d)
      s.sql(
        s"""CREATE OR REPLACE TEMPORARY VIEW graft_clicks
            USING graft OPTIONS (path '${st.dirOf("clicks")}')""")
      s.sql(
        """SELECT CAST(date_trunc('DAY', ts) AS TIMESTAMP_NTZ) AS day,
                  count(*) AS n,
                  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_v,
                  min(event_id) AS min_id, max(event_id) AS max_id
           FROM graft_clicks
           WHERE ts >= TIMESTAMP_NTZ'2024-01-10 00:00:00'
             AND ts <  TIMESTAMP_NTZ'2024-01-20 00:00:00'
           GROUP BY 1 ORDER BY 1""")
    },

    // Data skipping: the WHERE is on event_id — NOT the ordered column —
    // and prunes via the secondary-column zone maps in the sidecar
    // (event_id correlates with ts in the events table, so files are
    // effectively clustered on it). The window is SF-RELATIVE —
    // [20%, 40%] of max(event_id) — not an absolute BETWEEN: the
    // absolute form read zero rows at sf0.001 (the m8 fixture-constant
    // class, caught by SmokeSurfaceSpec). max(event_id) is answered
    // from the sidecar zone maps (GraftStatsAgg → LocalRelation, zero
    // files), so the bounds stay driver-side LITERALS and the skipping
    // demonstration — pushed literal range over a pruned file set —
    // is unchanged.
    "s4_skipping_scan" -> { (s, d) =>
      val st = ensure(s, d)
      graft.sources.GraftStatsAgg.register(s)
      s.sql(
        s"""CREATE OR REPLACE TEMPORARY VIEW graft_clicks_skip
            USING graft OPTIONS (path '${st.dirOf("clicks")}')""")
      val maxId = s.sql("SELECT max(event_id) FROM graft_clicks_skip")
        .head().getAs[Number](0).longValue
      s.sql(
        s"""SELECT user_id, count(*) AS n,
                  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_v
           FROM graft_clicks_skip
           WHERE event_id BETWEEN ${maxId / 5L} AND ${maxId * 2L / 5L}
           GROUP BY user_id ORDER BY user_id""")
    },

    // Metadata-only aggregates: whole-dataset COUNT/MIN/MAX answered
    // from the sidecar zone maps by the GraftStatsAgg optimizer rule —
    // the physical plan is a LocalRelation, zero files opened.
    "s5_stats_agg" -> { (s, d) =>
      val st = ensure(s, d)
      graft.sources.GraftStatsAgg.register(s)
      s.sql(
        s"""CREATE OR REPLACE TEMPORARY VIEW graft_clicks_meta
            USING graft OPTIONS (path '${st.dirOf("clicks")}')""")
      s.sql(
        """SELECT count(*) AS n, min(ts) AS min_ts, max(ts) AS max_ts,
                  min(event_id) AS min_id, max(event_id) AS max_id,
                  min(value) AS min_v, max(value) AS max_v
           FROM graft_clicks_meta""")
    },

    // Approximate COUNT(DISTINCT) from the sidecar's per-file HLL
    // sketches: the estimate is a pure driver-side union of ~2 KB
    // sketches — zero data files opened — and must land within the
    // sketch's advertised tolerance of the exact count (computed here
    // as the gated reference value; the oracle recomputes it).
    "s7_approx_distinct" -> { (s, d) =>
      val st = ensure(s, d)
      val ds = st.get("clicks")
      def within5pct(est: Long, exact: Long): Boolean =
        math.abs(est - exact) <= math.max(1L, (exact * 0.05).toLong)
      val ex = ds.df.agg(
        countDistinct(col("event_id")).as("e"),
        countDistinct(col("user_id")).as("u")).head()
      import s.implicits._
      Seq(
        ("event_id", ex.getLong(0),
          within5pct(ds.approxDistinct("event_id"), ex.getLong(0))),
        ("user_id", ex.getLong(1),
          within5pct(ds.approxDistinct("user_id"), ex.getLong(1))))
        .toDF("col_name", "n_exact", "est_ok")
        .orderBy("col_name")
    },

    // Hybrid range COUNT: files fully inside the WHERE range are
    // counted from the sidecar; only the two boundary files are
    // scanned (GraftStatsAgg rewrite — covered + boundary union).
    "s6_range_count" -> { (s, d) =>
      val st = ensure(s, d)
      graft.sources.GraftStatsAgg.register(s)
      s.sql(
        s"""CREATE OR REPLACE TEMPORARY VIEW graft_clicks_cnt
            USING graft OPTIONS (path '${st.dirOf("clicks")}')""")
      s.sql(
        """SELECT count(*) AS n, min(ts) AS min_ts, max(ts) AS max_ts,
                  min(value) AS min_v
           FROM graft_clicks_cnt
           WHERE ts >= TIMESTAMP_NTZ'2024-01-05 00:00:00'
             AND ts <  TIMESTAMP_NTZ'2024-01-25 00:00:00'""")
    },

    // M7: range delete — interior files dropped by a metadata-only
    // commit, boundary files rewritten; survivors read back in full.
    "m7_delete_range" -> { (s, d) =>
      val st = ensure(s, d)
      st.get("purged").df
        .select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy("event_id")
    },

    // M8: additive schema evolution — a pre-evolution file set and an
    // evolved append read back as ONE relation, nulls where the old
    // files predate the column.
    "m8_schema_evolution" -> { (s, d) =>
      val st = ensure(s, d)
      st.get("evolved").df
        .select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy("event_id")
    },

    // W3-W4: synchronized multi-dataset range scan; the union of the
    // yielded per-interval slices tagged by dataset key.
    "w3_intersections" -> { (s, d) =>
      val st = ensure(s, d)
      val lo = OrdTs(java.time.LocalDateTime.of(2024, 1, 8, 0, 0)
        .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L)
      val hi = OrdTs(java.time.LocalDateTime.of(2024, 1, 25, 0, 0)
        .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L)
      st.intersectionsDF(Seq("clicks", "purchases"), Some(lo), Some(hi),
          identity)
        .select("ds_key", "event_id", "ts", "value")
        .orderBy("ds_key", "event_id")
    },

    // T1-T9: restartable incremental aggregation — results after a
    // 3-chunk run with a mid-stream restart equal the one-shot hourly agg.
    "t3_aggstream_restart" -> { (s, d) =>
      val st = ensure(s, d)
      new AggStream(st, "ts", "event_id",
        Map("hourly" -> StreamKeyCfg(None, "1 hour", aggs = aggSpecs)),
        NRows(5000))
        .results("hourly")
        .orderBy("bin")
    },

    // G3/T1 incrementally: count-based bins accumulated across 3 chunks
    // + a restart equal the one-shot 500-row binning.
    "t7_aggstream_xrows" -> { (s, d) =>
      val st = ensure(s, d)
      new AggStream(st, "ts", "event_id",
        Map("xrows" -> StreamKeyCfg(None, "", aggs = aggSpecs,
          xRows = Some(500))),
        NRows(5000))
        .results("xrows")
        .orderBy("bin")
    },

    // T2/T3 natively: the Structured Streaming hourly aggregation
    // (state store + checkpoint) must equal the same one-shot oracle as
    // the batch-incremental path.
    "t8_streaming_native" -> { (s, d) =>
      ensure(s, d)
      StreamingAgg.results(s, s"${baseDir(d)}/streaming_hourly", aggSpecs)
        .withColumn("bin", col("bin").cast("timestamp_ntz"))
        .orderBy("bin")
    },

    // The graft store AS a Structured Streaming source: three ordered
    // commits tailed as micro-batches (generation offsets) into the
    // t8 hourly aggregation — identical oracle to t8 by construction.
    "t14_graft_stream_source" -> { (s, d) =>
      ensure(s, d)
      StreamingAgg.results(s, s"${baseDir(d)}/stream_src_hourly",
          aggSpecs)
        .withColumn("bin", col("bin").cast("timestamp_ntz"))
        .orderBy("bin")
    },

    // G3/T1 in the state store: native-streaming count bins over the
    // 3-commit graft source must equal the one-shot 500-row binning —
    // the same oracle as the batch-incremental t7.
    "t16_streaming_xrows" -> { (s, d) =>
      ensure(s, d)
      StreamingXRows.results(s, s"${baseDir(d)}/streaming_xrows")
        .withColumn("bin_label", col("bin_label").cast("timestamp_ntz"))
        .orderBy("bin")
    },

    // The count-bin SCALE-OUT path, tested rather than asserted:
    // per-event_type 300-row bins over the same 3-commit stream — N
    // independent sequential folds whose per-key results must each
    // equal the one-shot per-key binning.
    "t17_streaming_xrows_keyed" -> { (s, d) =>
      ensure(s, d)
      StreamingXRows.results(s, s"${baseDir(d)}/streaming_xrows_keyed")
        .withColumn("bin_label", col("bin_label").cast("timestamp_ntz"))
        .withColumnRenamed("key", "event_type")
        .orderBy("event_type", "bin")
    },

    // The graft store AS a Structured Streaming sink: events streamed
    // in micro-batches through writeStream.format("graft") with
    // exactly-once epoch stamping; full readback equals the raw table.
    "t15_graft_stream_sink" -> { (s, d) =>
      val st = ensure(s, d)
      st.get("sink_ds").df
        .select(col("event_id"), col("ts").cast("timestamp_ntz").as("ts"),
          col("user_id"), col("event_type"), col("value"))
        .orderBy("event_id")
    },

    // T6 natively: Structured Streaming snapshot cells (state store +
    // checkpoint) + read-time running combine must equal the one-shot
    // snapshot oracle.
    "t9_streaming_snapshots" -> { (s, d) =>
      ensure(s, d)
      StreamingAgg.resultsSnapshots(s, s"${baseDir(d)}/streaming_snap",
          aggSpecs)
        .withColumn("bin", col("bin").cast("timestamp_ntz"))
        .withColumn("snap", col("snap").cast("timestamp_ntz"))
        .orderBy("bin", "snap")
    },

    // T6 incrementally: running within-bin values at snapshot points,
    // accumulated across 3 chunks + a restart, must equal the one-shot
    // snapshot aggregation.
    "t6_aggstream_snapshots" -> { (s, d) =>
      val st = ensure(s, d)
      new AggStream(st, "ts", "event_id",
        Map("daily_snap" -> StreamKeyCfg(None, "1 day", aggs = aggSpecs,
          snapFreq = Some("6 hours"))),
        NRows(5000))
        .results("daily_snap")
        .orderBy("bin", "snap")
    },

    // snap_by × by_x_rows (ref segmentby.py:712-1028): 500-row bins
    // observed at 12-hour snapshot points, accumulated incrementally
    // across 3 chunks + a restart.
    "t10_xrows_snapshots" -> { (s, d) =>
      val st = ensure(s, d)
      new AggStream(st, "ts", "event_id",
        Map("xrows_snap" -> StreamKeyCfg(None, "", aggs = aggSpecs,
          snapFreq = Some("12 hours"), xRows = Some(500))),
        NRows(5000))
        .results("xrows_snap")
        .orderBy("bin", "snap")
    },

    // T6 empty-snapshot forwarding in the incremental path: running
    // values forwarded through empty cells on the full per-bin snapshot
    // grid, from partials accumulated across 3 chunks + a restart.
    "t12_snapshot_spine_stream" -> { (s, d) =>
      val st = ensure(s, d)
      new AggStream(st, "ts", "event_id",
        Map("purch_snap" -> StreamKeyCfg(
          Some(col("event_type") === "purchase" && col("value") > 180.0),
          "1 day", aggs = aggSpecs, snapFreq = Some("1 hour"))),
        NRows(5000))
        .snapResultsWithSpine("purch_snap").get
        .orderBy("bin", "snap")
    },

    // T9 dual-frame post hook (ref post(buffer, bin_res, snap_res),
    // aggstream.py:703-719, 750-782): the post receives the finalized
    // per-bin frame AND the running snapshot frame, and grafts the
    // bin-level value spread onto every snapshot row.
    "t11_post_dual" -> { (s, d) =>
      val st = ensure(s, d)
      val post: (DataFrame, Option[DataFrame]) => DataFrame =
        (bins, snaps) => snaps.get.join(
          bins.select(col("bin"),
            (col("max_v") - col("min_v")).as("bin_spread")),
          Seq("bin"))
          .select("bin", "snap", "sum_v", "bin_spread")
      new AggStream(st, "ts", "event_id",
        Map("daily_snap" -> StreamKeyCfg(None, "1 day", aggs = aggSpecs,
          snapFreq = Some("6 hours"), post = Some(post))),
        NRows(5000))
        .results("daily_snap")
        .orderBy("bin", "snap")
    }
  )

  def oracleSql: Map[String, String] = Map(
    // generation 1 of the upsert dataset IS the initial load
    "m9_time_travel" -> s"""$EV
       SELECT event_id, ts, user_id, event_type, value
       FROM e WHERE event_id % 10 <> 0 ORDER BY event_id""",

    "m6_upsert" -> s"""$EV,
         init AS (SELECT * FROM e WHERE event_id % 10 <> 0),
         b AS (SELECT event_id, ts, user_id, event_type,
                      value + 1000.0 AS value
               FROM e WHERE event_id % 3 = 0),
         u AS (SELECT *, 0 AS src FROM init
               UNION ALL SELECT *, 1 AS src FROM b),
         dd AS (SELECT *, row_number() OVER (
                  PARTITION BY ts ORDER BY src DESC) AS rn FROM u)
         SELECT event_id, ts, user_id, event_type, value
         FROM dd WHERE rn = 1 ORDER BY event_id""",

    // the diff of the two generation states m9/m6 already pin down
    "m10_change_feed" -> s"""$EV,
         init AS (SELECT event_id, ts, user_id, event_type, value
                  FROM e WHERE event_id % 10 <> 0),
         b AS (SELECT event_id, ts, user_id, event_type,
                      value + 1000.0 AS value
               FROM e WHERE event_id % 3 = 0),
         u AS (SELECT *, 0 AS src FROM init
               UNION ALL SELECT *, 1 AS src FROM b),
         dd AS (SELECT *, row_number() OVER (
                  PARTITION BY ts ORDER BY src DESC) AS rn FROM u),
         fin AS (SELECT event_id, ts, user_id, event_type, value
                 FROM dd WHERE rn = 1)
         SELECT *, 'insert' AS change_type FROM
           (SELECT * FROM fin EXCEPT ALL SELECT * FROM init)
         UNION ALL
         SELECT *, 'delete' AS change_type FROM
           (SELECT * FROM init EXCEPT ALL SELECT * FROM fin)
         ORDER BY change_type, event_id, ts""",

    "m11_clustered_readback" -> s"""$EV
         SELECT event_id, ts, user_id, event_type, value FROM e
         WHERE user_id = 7
           AND ts >= TIMESTAMP '2024-01-08 00:00:00'
           AND ts <  TIMESTAMP '2024-01-20 00:00:00'
         ORDER BY event_id""",

    // sharding is a physical re-layout: readback of the range is just
    // the events rows inside it
    "m12_sharded_readback" -> s"""$EV
         SELECT event_id, ts, user_id, event_type, value FROM e
         WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
           AND ts <  TIMESTAMP '2024-01-20 00:00:00'
         ORDER BY event_id""",

    "s2_pruned_scan" -> s"""$EV
         SELECT event_id, ts, user_id, value FROM e
         WHERE event_type = 'click'
           AND ts >= TIMESTAMP '2024-01-12 00:00:00'
           AND ts <  TIMESTAMP '2024-01-22 00:00:00'
         ORDER BY event_id""",

    "s3_sql_source" -> s"""$EV
         SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                count(*) AS n,
                CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_v,
                min(event_id) AS min_id, max(event_id) AS max_id
         FROM e
         WHERE event_type = 'click'
           AND ts >= TIMESTAMP '2024-01-10 00:00:00'
           AND ts <  TIMESTAMP '2024-01-20 00:00:00'
         GROUP BY 1 ORDER BY 1""",

    "s4_skipping_scan" -> s"""$EV
         SELECT user_id, count(*) AS n,
                CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_v
         FROM e
         WHERE event_type = 'click'
           AND event_id BETWEEN
             (SELECT max(event_id) // 5 FROM e WHERE event_type = 'click')
             AND
             (SELECT max(event_id) * 2 // 5 FROM e WHERE event_type = 'click')
         GROUP BY user_id ORDER BY user_id""",

    "s5_stats_agg" -> s"""$EV
         SELECT count(*) AS n, min(ts) AS min_ts, max(ts) AS max_ts,
                min(event_id) AS min_id, max(event_id) AS max_id,
                min(value) AS min_v, max(value) AS max_v
         FROM e WHERE event_type = 'click'""",

    "s7_approx_distinct" -> s"""$EV
         SELECT col_name, n_exact, true AS est_ok FROM (
           SELECT 'event_id' AS col_name,
                  count(DISTINCT event_id) AS n_exact
           FROM e WHERE event_type = 'click'
           UNION ALL
           SELECT 'user_id', count(DISTINCT user_id)
           FROM e WHERE event_type = 'click')
         ORDER BY col_name""",

    "s6_range_count" -> s"""$EV
         SELECT count(*) AS n, min(ts) AS min_ts, max(ts) AS max_ts,
                min(value) AS min_v
         FROM e
         WHERE event_type = 'click'
           AND ts >= TIMESTAMP '2024-01-05 00:00:00'
           AND ts <  TIMESTAMP '2024-01-25 00:00:00'""",

    "m7_delete_range" -> s"""$EV
         SELECT event_id, ts, user_id, event_type, value FROM e
         WHERE ts < TIMESTAMP '2024-01-10 00:00:00'
            OR ts >= TIMESTAMP '2024-01-18 00:00:00'
         ORDER BY event_id""",

    "m8_schema_evolution" -> s"""$EV
         SELECT event_id, ts,
                CASE WHEN event_id >=
                  (SELECT LEAST(5000, max(event_id) // 2 + 1) FROM e)
                THEN user_id END AS user_id,
                event_type, value
         FROM e ORDER BY event_id""",

    "w3_intersections" -> s"""$EV
         SELECT 'clicks' AS ds_key, event_id, ts, value FROM e
         WHERE event_type = 'click'
           AND ts >= TIMESTAMP '2024-01-08 00:00:00'
           AND ts <  TIMESTAMP '2024-01-25 00:00:00'
         UNION ALL
         SELECT 'purchases' AS ds_key, event_id, ts, value FROM e
         WHERE event_type = 'purchase'
           AND ts >= TIMESTAMP '2024-01-08 00:00:00'
           AND ts <  TIMESTAMP '2024-01-25 00:00:00'
         ORDER BY ds_key, event_id""",

    "t3_aggstream_restart" -> s"""$EV
         SELECT date_trunc('hour', ts) AS bin,
              min_by(value, event_id) AS first_v,
              max_by(value, event_id) AS last_v,
              min(value) AS min_v, max(value) AS max_v,
              CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_v
         FROM e GROUP BY 1 ORDER BY 1""",

    "t7_aggstream_xrows" -> s"""$EV
         SELECT CAST(floor((rn - 1) / 500) AS BIGINT) AS bin,
              min(ts) AS bin_label,
              count(*) AS n_rows,
              min_by(value, event_id) AS first_v,
              max_by(value, event_id) AS last_v,
              min(value) AS min_v, max(value) AS max_v,
              CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_v
         FROM (SELECT *, row_number() OVER (ORDER BY ts, event_id) AS rn
               FROM e)
         GROUP BY 1 ORDER BY 1""",

    "t16_streaming_xrows" -> s"""$EV
         SELECT CAST(floor((rn - 1) / 500) AS BIGINT) AS bin,
              min(ts) AS bin_label,
              count(*) AS n_rows,
              min_by(value, event_id) AS first_v,
              max_by(value, event_id) AS last_v,
              min(value) AS min_v, max(value) AS max_v,
              CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_v
         FROM (SELECT *, row_number() OVER (ORDER BY ts, event_id) AS rn
               FROM e)
         GROUP BY 1 ORDER BY 1""",

    "t17_streaming_xrows_keyed" -> s"""$EV
         SELECT event_type,
              CAST(floor((rn - 1) / 300) AS BIGINT) AS bin,
              min(ts) AS bin_label,
              count(*) AS n_rows,
              min_by(value, event_id) AS first_v,
              max_by(value, event_id) AS last_v,
              min(value) AS min_v, max(value) AS max_v,
              CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_v
         FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                                            ORDER BY ts, event_id) AS rn
               FROM e)
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "t8_streaming_native" -> s"""$EV
         SELECT date_trunc('hour', ts) AS bin,
              min_by(value, event_id) AS first_v,
              max_by(value, event_id) AS last_v,
              min(value) AS min_v, max(value) AS max_v,
              CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_v
         FROM e GROUP BY 1 ORDER BY 1""",

    "t14_graft_stream_source" -> s"""$EV
         SELECT date_trunc('hour', ts) AS bin,
              min_by(value, event_id) AS first_v,
              max_by(value, event_id) AS last_v,
              min(value) AS min_v, max(value) AS max_v,
              CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_v
         FROM e GROUP BY 1 ORDER BY 1""",

    "t15_graft_stream_sink" -> s"""$EV
         SELECT event_id, ts, user_id, event_type, value
         FROM e ORDER BY event_id""",

    "t9_streaming_snapshots" -> s"""$EV
         SELECT bin, snap,
              first_value(c_first) OVER w AS first_v,
              last_value(c_last) OVER w AS last_v,
              min(c_min) OVER w AS min_v,
              max(c_max) OVER w AS max_v,
              CAST(sum(c_sum) OVER w AS DOUBLE) AS sum_v
         FROM (SELECT date_trunc('day', ts) AS bin,
                      time_bucket(INTERVAL '6 hours', ts) AS snap,
                      min_by(value, event_id) AS c_first,
                      max_by(value, event_id) AS c_last,
                      min(value) AS c_min, max(value) AS c_max,
                      SUM(CAST(value AS DECIMAL(38,6))) AS c_sum
               FROM e GROUP BY 1, 2)
         WINDOW w AS (PARTITION BY bin ORDER BY snap
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY bin, snap""",

    "t6_aggstream_snapshots" -> s"""$EV
         SELECT bin, snap,
              first_value(c_first) OVER w AS first_v,
              last_value(c_last) OVER w AS last_v,
              min(c_min) OVER w AS min_v,
              max(c_max) OVER w AS max_v,
              CAST(sum(c_sum) OVER w AS DOUBLE) AS sum_v
         FROM (SELECT date_trunc('day', ts) AS bin,
                      time_bucket(INTERVAL '6 hours', ts) AS snap,
                      min_by(value, event_id) AS c_first,
                      max_by(value, event_id) AS c_last,
                      min(value) AS c_min, max(value) AS c_max,
                      SUM(CAST(value AS DECIMAL(38,6))) AS c_sum
               FROM e GROUP BY 1, 2)
         WINDOW w AS (PARTITION BY bin ORDER BY snap
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY bin, snap""",

    "t10_xrows_snapshots" -> s"""$EV,
         numbered AS (SELECT *,
                row_number() OVER (ORDER BY ts, event_id) AS rn FROM e),
         cells AS (SELECT CAST(floor((rn - 1) / 500) AS BIGINT) AS bin,
                      time_bucket(INTERVAL '12 hours', ts) AS snap,
                      min(ts) AS c_label, count(*) AS c_n,
                      min_by(value, event_id) AS c_first,
                      max_by(value, event_id) AS c_last,
                      min(value) AS c_min, max(value) AS c_max,
                      SUM(CAST(value AS DECIMAL(38,6))) AS c_sum
               FROM numbered GROUP BY 1, 2)
         SELECT bin,
              min(c_label) OVER (PARTITION BY bin) AS bin_label,
              snap,
              CAST(sum(c_n) OVER w AS BIGINT) AS n_rows,
              first_value(c_first) OVER w AS first_v,
              last_value(c_last) OVER w AS last_v,
              min(c_min) OVER w AS min_v,
              max(c_max) OVER w AS max_v,
              CAST(sum(c_sum) OVER w AS DOUBLE) AS sum_v
         FROM cells
         WINDOW w AS (PARTITION BY bin ORDER BY snap
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY bin, snap""",

    "t12_snapshot_spine_stream" -> s"""$EV,
         base AS (
           SELECT bin, snap,
                first_value(c_first) OVER w AS first_v,
                last_value(c_last) OVER w AS last_v,
                min(c_min) OVER w AS min_v,
                max(c_max) OVER w AS max_v,
                CAST(sum(c_sum) OVER w AS DOUBLE) AS sum_v
           FROM (SELECT date_trunc('day', ts) AS bin,
                        time_bucket(INTERVAL '1 hour', ts) AS snap,
                        min_by(value, event_id) AS c_first,
                        max_by(value, event_id) AS c_last,
                        min(value) AS c_min, max(value) AS c_max,
                        SUM(CAST(value AS DECIMAL(38,6))) AS c_sum
                 FROM e WHERE event_type = 'purchase' AND value > 180.0
                 GROUP BY 1, 2)
           WINDOW w AS (PARTITION BY bin ORDER BY snap
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         bins AS (SELECT DISTINCT bin FROM base),
         spine AS (SELECT bin, unnest(generate_series(bin,
                        bin + INTERVAL 23 HOUR, INTERVAL 1 HOUR)) AS snap
                   FROM bins)
       SELECT spine.bin, spine.snap,
            last_value(first_v IGNORE NULLS) OVER w2 AS first_v,
            last_value(last_v IGNORE NULLS) OVER w2 AS last_v,
            last_value(min_v IGNORE NULLS) OVER w2 AS min_v,
            last_value(max_v IGNORE NULLS) OVER w2 AS max_v,
            last_value(sum_v IGNORE NULLS) OVER w2 AS sum_v
       FROM spine LEFT JOIN base USING (bin, snap)
       WINDOW w2 AS (PARTITION BY spine.bin ORDER BY spine.snap
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       ORDER BY spine.bin, spine.snap""",

    "t11_post_dual" -> s"""$EV,
         cells AS (SELECT date_trunc('day', ts) AS bin,
                      time_bucket(INTERVAL '6 hours', ts) AS snap,
                      min(value) AS c_min, max(value) AS c_max,
                      SUM(CAST(value AS DECIMAL(38,6))) AS c_sum
               FROM e GROUP BY 1, 2),
         snaps AS (SELECT bin, snap,
                      CAST(sum(c_sum) OVER w AS DOUBLE) AS sum_v
               FROM cells
               WINDOW w AS (PARTITION BY bin ORDER BY snap
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         bins AS (SELECT bin, max(c_max) - min(c_min) AS bin_spread
               FROM cells GROUP BY 1)
         SELECT s.bin, s.snap, s.sum_v, b.bin_spread
         FROM snaps s JOIN bins b USING (bin)
         ORDER BY s.bin, s.snap"""
  )
}
