package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` table (batch form of the
  * streaming ops in graft.streaming — same plans run under readStream with
  * a watermark; see StreamingSyncSpec).
  */
object EventsQueries {

  /** Tumbling hourly windows per event type. The hour is emitted as epoch
    * micros so both engines hash identically regardless of timestamp
    * rendering.
    */
  def hourlyCounts(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(
        unix_micros(date_trunc("hour", col("ts"))).as("hour_us"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        Gate.sumMeasure(col("value")).as("sum_value"))
      .orderBy("hour_us", "event_type")

  val hourlyCountsSql: String =
    s"""SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, event_type,
       |  count(*) AS n_events,
       |  ${Gate.sumMeasureSql("value")} AS sum_value
       |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Sessionization: a new session starts after a >30 min gap per user;
    * pure window functions (lag + running sum), no driver-side state.
    */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, dir)
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 30L * 60 * 1000000,
          1).otherwise(0))
      .groupBy("user_id")
      .agg(sum("new_session").as("n_sessions"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  val sessionizeSql: String =
    """WITH flagged AS (
      |  SELECT user_id,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
      |      THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
      |  count(*) AS n_events
      |FROM flagged GROUP BY user_id ORDER BY user_id""".stripMargin
  // NB: DuckDB integer sums are HUGEINT (arrow decimal128) — always CAST
  // integer sums to BIGINT in oracle SQL so types line up with Spark longs.

  /** As-of join in the gate: every click enriched with the user's latest
    * at-or-before view (DuckDB's native ASOF JOIN is the oracle). The
    * Spark plan is the tagged-union window form — one shuffle, no
    * range-condition nested loop.
    */
  def asofClickView(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "ts", "event_id", "value")
    val views = ev.filter(col("event_type") === "view")
      .groupBy("user_id", "ts")
      .agg(max(col("value")).as("view_value"))
    graft.operators.AsOfJoin
      .lastPrior(clicks, views, "user_id", "ts", Seq("view_value"))
      .agg(
        count(lit(1)).as("n_clicks"),
        count(col("view_value")).as("n_matched"),
        Gate.sumMeasure(col("view_value")).as("sum_view_value"))
  }

  val asofClickViewSql: String =
    s"""WITH clicks AS (
      |  SELECT user_id, ts, event_id, value FROM events
      |  WHERE event_type = 'click'),
      |views AS (
      |  SELECT user_id, ts, max(value) AS view_value FROM events
      |  WHERE event_type = 'view' GROUP BY 1, 2)
      |SELECT count(*) AS n_clicks,
      |  count(view_value) AS n_matched,
      |  ${Gate.sumMeasureSql("view_value")} AS sum_view_value
      |FROM clicks ASOF LEFT JOIN views
      |  ON clicks.user_id = views.user_id AND views.ts <= clicks.ts""".stripMargin

  /** Range join in the gate: each user's events inside their first active
    * hour, via the bucketized interval join (points equi-join their time
    * bin; intervals explode to spanned bins; exact predicate verifies).
    * Oracle: plain inequality join in DuckDB.
    */
  def rangeJoinFirstHour(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("value"))
    val hourUs = 3600L * 1000000L
    val intervals = ev.groupBy("user_id")
      .agg(min(col("ts_us")).as("start_us"))
      .withColumn("end_us", col("start_us") + hourUs)
    graft.operators.RangeJoin.pointInInterval(
        ev, intervals, "ts_us", "start_us", "end_us",
        binWidth = 15L * 60L * 1000000L, keyCols = Seq("user_id"))
      .agg(
        count(lit(1)).as("n_first_hour"),
        countDistinct(col("user_id")).as("n_users"),
        Gate.sumMeasure(col("value")).as("sum_value"))
  }

  val rangeJoinFirstHourSql: String =
    s"""WITH ev AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us, value FROM events),
      |iv AS (
      |  SELECT user_id, min(ts_us) AS start_us,
      |    min(ts_us) + 3600000000 AS end_us
      |  FROM ev GROUP BY user_id)
      |SELECT count(*) AS n_first_hour,
      |  count(DISTINCT ev.user_id) AS n_users,
      |  ${Gate.sumMeasureSql("value")} AS sum_value
      |FROM ev JOIN iv ON ev.user_id = iv.user_id
      |  AND ev.ts_us >= iv.start_us AND ev.ts_us < iv.end_us""".stripMargin

  /** The SAME hourly roll-up, but executed by Structured Streaming:
    * events staged into a directory, read back via readStream, aggregated
    * with a watermark + tumbling window, drained with Trigger.AvailableNow
    * into a memory sink — and hash-matched against the identical DuckDB
    * oracle as the batch form. Streams are first-class: a streaming plan
    * must produce the same answer as the batch plan, bit for bit.
    */
  def streamingHourlyCounts(s: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.streaming.Trigger
    val stage = graft.util.TempDirs.create("graft_stream_gate")
    Files.copy(Paths.get(s"$dir/events.parquet"),
      Paths.get(stage, "events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val raw = s.read.parquet(s"$dir/events.parquet")
    val stream = graft.streaming.StreamingOps.eventStream(s, stage, raw.schema)
    // state = hours × event types (~10^3 keys) — single-digit partitions
    val q = graft.streaming.StreamingOps.withStatePartitions(s, 8) {
      graft.streaming.StreamingOps.windowedCounts(stream)
        .writeStream.outputMode("complete").format("memory")
        .queryName("graft_gate_stream_hourly")
        .trigger(Trigger.AvailableNow()).start()
    }
    q.awaitTermination()
    s.table("graft_gate_stream_hourly").orderBy("hour_us", "event_type")
  }

  /** Watermark LATE-DATA semantics, exactly oracled. Three micro-batches
    * through an append-mode windowed aggregation with a 240-hour
    * watermark:
    *   1. on-time arrivals (`event_id % 5 != 0`, 80%) — sets the
    *      watermark at max(on-time event time, ms floor) − 240 h;
    *   2. late arrivals (`event_id % 5 == 0`, spread over the full 30-day
    *      range) — rows whose 1-hour window closed at that watermark are
    *      DROPPED, the rest merge into still-open windows;
    *   3. two far-future sentinel rows — the first advances the
    *      watermark past every real window, the second forces the batch
    *      that emits them (append mode emits a window exactly once, when
    *      the watermark passes its end); both filtered from the result.
    * The oracle recomputes Spark's drop rule in SQL: kept late rows are
    * those with `window_end_us > (ms-floored on-time max − 240h) · 1000`.
    * Counts AND micros-exact sums must match — a partially-merged or
    * double-emitted window cannot hash-match.
    */
  def streamingLateData(s: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    val stage = graft.util.TempDirs.create("graft_stream_late")
    val raw = s.read.parquet(s"$dir/events.parquet")
    def stageBatch(df: DataFrame, name: String): Unit = {
      val tmp = graft.util.TempDirs.create("graft_stream_late_tmp")
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath, Paths.get(stage, s"$name.parquet"))
    }
    val maxUs = Tables.normalizeTs(raw)
      .agg(max(unix_micros(col("ts")))).head().getLong(0)
    val dayUs = 24L * 3600 * 1000 * 1000
    // sentinel ts literals must match the STAGED file schema (the stream
    // reads with raw.schema), whichever representation this testdata
    // generation shipped
    def tsLit(us: Long) = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => lit(us * 1000L)
      case org.apache.spark.sql.types.TimestampNTZType =>
        expr(s"cast(timestamp_micros(${us}L) as timestamp_ntz)")
      case _ => expr(s"timestamp_micros(${us}L)")
    }
    val stream = graft.streaming.StreamingOps.eventStream(s, stage, raw.schema)
    // 4 staged micro-batches each open+commit one state store per
    // partition — size state partitions to the window-key count, not
    // the session default (see withStatePartitions)
    val q = graft.streaming.StreamingOps.withStatePartitions(s, 8) {
      graft.streaming.StreamingOps
        .windowedCounts(stream, delay = "240 hours")
        .writeStream.outputMode("append").format("memory")
        .queryName("graft_gate_stream_late").start()
    }
    stageBatch(raw.filter(col("event_id") % 5 =!= 0), "b1")
    q.processAllAvailable()
    stageBatch(raw.filter(col("event_id") % 5 === 0), "b2")
    q.processAllAvailable()
    stageBatch(raw.limit(1).withColumn("ts", tsLit(maxUs + 30 * dayUs))
      .withColumn("event_type", lit("__late_sentinel__")), "s1")
    q.processAllAvailable()
    stageBatch(raw.limit(1).withColumn("ts", tsLit(maxUs + 60 * dayUs))
      .withColumn("event_type", lit("__late_sentinel__")), "s2")
    q.processAllAvailable()
    q.stop()
    s.table("graft_gate_stream_late")
      .filter(col("event_type") =!= "__late_sentinel__")
      .orderBy("hour_us", "event_type")
  }

  val streamingLateDataSql: String =
    s"""WITH wm AS (
       |  SELECT (epoch_ms(max(ts)) - 864000000) * 1000 AS wm_us
       |  FROM events WHERE event_id % 5 <> 0),
       |kept AS (
       |  SELECT ts, event_type, value FROM events WHERE event_id % 5 <> 0
       |  UNION ALL
       |  SELECT e.ts, e.event_type, e.value FROM events e, wm
       |  WHERE e.event_id % 5 = 0
       |    AND epoch_us(date_trunc('hour', e.ts)) + 3600000000 > wm.wm_us)
       |SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, event_type,
       |  count(*) AS n_events,
       |  ${Gate.sumMeasureSql("value")} AS sum_value
       |FROM kept GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Stream-stream interval join (view → purchase by the same user
    * within 1 hour), drained via AvailableNow into a memory sink and
    * aggregated to a compact exactly-oracled contract: pair count,
    * distinct attributed users, micros-exact purchase-value sum. The
    * oracle self-joins at MICROSECOND floor (`epoch_us`) because the
    * stream's event time is `timestamp_micros(ts div 1000)` — comparing
    * raw nanos would flip sub-microsecond boundary pairs.
    */
  def streamingIntervalJoin(s: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.streaming.Trigger
    val stage = graft.util.TempDirs.create("graft_stream_ij")
    Files.copy(Paths.get(s"$dir/events.parquet"),
      Paths.get(stage, "events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val raw = s.read.parquet(s"$dir/events.parquet")
    val stream = graft.streaming.StreamingOps.eventStream(s, stage, raw.schema)
    // join state = both sides' rows inside the watermark window — at
    // gate scale a handful of partitions; a production attribution join
    // sizes this up with expected state, not with the session default
    val q = graft.streaming.StreamingOps.withStatePartitions(s, 8) {
      graft.streaming.StreamingOps
        .intervalJoin(stream, "view", "purchase", 3600L * 1000000)
        .writeStream.outputMode("append").format("memory")
        .queryName("graft_gate_stream_ij")
        .trigger(Trigger.AvailableNow()).start()
    }
    q.awaitTermination()
    s.table("graft_gate_stream_ij")
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("user_id")).as("n_users"),
        Gate.sumMeasure(col("r_value")).as("sum_value"))
  }

  val streamingIntervalJoinSql: String =
    s"""SELECT count(*) AS n_pairs,
       |  CAST(count(DISTINCT v.user_id) AS BIGINT) AS n_users,
       |  ${Gate.sumMeasureSql("p.value")} AS sum_value
       |FROM events v JOIN events p
       |  ON v.user_id = p.user_id
       |  AND v.event_type = 'view' AND p.event_type = 'purchase'
       |  AND epoch_us(p.ts) >= epoch_us(v.ts)
       |  AND epoch_us(p.ts) <= epoch_us(v.ts) + 3600000000""".stripMargin

  /** The stateful streaming sessionizer (flatMapGroupsWithState) under
    * the SAME DuckDB oracle as the batch window form: a custom-state
    * streaming operator has to produce the batch answer, not just "a"
    * answer. Single AvailableNow batch → one update per user with final
    * totals.
    */
  def streamingSessionize(s: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.streaming.Trigger
    val stage = graft.util.TempDirs.create("graft_stream_sess_gate")
    Files.copy(Paths.get(s"$dir/events.parquet"),
      Paths.get(stage, "events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val raw = s.read.parquet(s"$dir/events.parquet")
    import s.implicits._
    val stream = graft.streaming.StreamingOps.eventStream(s, stage, raw.schema)
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .as[graft.streaming.StreamingOps.Event]
    val q = graft.streaming.StreamingOps.withStatePartitions(s, 8) {
      graft.streaming.StreamingOps.sessionCounts(s, stream)
        .writeStream.outputMode("append").format("memory")
        .queryName("graft_gate_stream_sess")
        .trigger(Trigger.AvailableNow()).start()
    }
    q.awaitTermination()
    s.table("graft_gate_stream_sess")
      .select("user_id", "n_sessions", "n_events")
      .orderBy("user_id")
  }

  /** Ordered view → click → purchase funnel — exactly oracled via
    * chained min-timestamp CTEs.
    */
  def eventsFunnel(s: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.stageCounts(Tables.events(s, dir), "user_id",
      "event_type", "ts", Seq("view", "click", "purchase"))

  val eventsFunnelSql: String =
    """WITH v AS (
      |  SELECT user_id, min(ts) AS t FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |c AS (
      |  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN v USING (user_id)
      |  WHERE e.event_type = 'click' AND e.ts > v.t GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN c USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.ts > c.t GROUP BY e.user_id)
      |SELECT 1 AS stage_idx, 'view' AS stage,
      |  (SELECT count(*) FROM v) AS n_users
      |UNION ALL SELECT 2, 'click', (SELECT count(*) FROM c)
      |UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM p)
      |ORDER BY stage_idx""".stripMargin

  /** Top event value per user per type via dense ranking — deterministic
    * tie-breaks on event_id.
    */
  def topEventPerUser(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(col("value").desc, col("event_id"))
    Tables.events(s, dir)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select("user_id", "event_id", "event_type", "value")
      .orderBy("user_id")
  }

  val topEventPerUserSql: String =
    """SELECT user_id, event_id, event_type, value FROM (
      |  SELECT user_id, event_id, event_type, value,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY value DESC, event_id) AS rnk
      |  FROM events)
      |WHERE rnk = 1 ORDER BY user_id""".stripMargin

  /** Exactly-once streaming sink: events arrive as two micro-batches
    * (maxFilesPerTrigger=1 over two staged splits) and land in a Delta
    * table through the idempotent `txn`-tracked commit; a deliberate
    * REPLAY of batch 0 afterwards must be detected and skipped. The
    * read-back aggregate matches the full events table only if every
    * batch landed exactly once — a double-applied or dropped batch
    * cannot hash-match.
    */
  def streamingDeltaSink(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val stage = graft.util.TempDirs.create("graft_sink_stage")
    val table = graft.util.TempDirs.create("graft_sink_delta")
    val ckpt = graft.util.TempDirs.create("graft_sink_ckpt")
    val raw = s.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"))
    Seq(0, 1).foreach { half =>
      raw.filter(col("event_id") % 2 === half).coalesce(1)
        .write.parquet(s"$stage/half-$half")
      val part = new java.io.File(s"$stage/half-$half").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(stage, s"batch-$half.parquet"))
    }
    val stream = s.readStream.schema(raw.schema)
      .option("maxFilesPerTrigger", 1).parquet(stage)
    val q = graft.formats.delta.DeltaStreamSink
      .writeStream(stream, table, ckpt, appId = "graft_sink_gate")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // replay: a restarted stream re-offers batch 0 — must be a no-op
    require(!graft.formats.delta.DeltaStreamSink.appendBatch(s, table,
      raw.filter(col("event_id") % 2 === 0), "graft_sink_gate", 0L),
      "replayed micro-batch was not skipped")
    new graft.formats.delta.DeltaConversionSource(s, table, "events")
      .toDataFrame
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), Gate.sumMeasure(col("value")).as("sum_v"))
      .orderBy("event_type")
  }

  val streamingDeltaSinkSql: String =
    s"""SELECT event_type, count(*) AS cnt,
       |  ${Gate.sumMeasureSql("value")} AS sum_v
       |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Exactly-once streaming sink into ICEBERG — the Delta sink's twin:
    * a first half seeds the table through a sync, the second half
    * arrives as micro-batches through the txn-stamped append, and a
    * deliberate REPLAY of batch 0 must be skipped. The read-back
    * aggregate matches the full events table only if every batch landed
    * exactly once.
    */
  def streamingIcebergSink(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val stage = graft.util.TempDirs.create("graft_isink_stage")
    val seedDir = graft.util.TempDirs.create("graft_isink_seed")
    val table = graft.util.TempDirs.create("graft_isink_ice")
    val ckpt = graft.util.TempDirs.create("graft_isink_ckpt")
    val raw = s.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"))
    raw.filter(col("event_id") % 2 === 0)
      .write.mode("overwrite").parquet(seedDir)
    val src0 = new graft.sources.ParquetDirectorySource(s, seedDir, "events")
    val outcomes = graft.sync.TableFormatSync.syncSnapshot(
      Seq(new graft.formats.iceberg.IcebergConversionTarget(s, table)),
      src0.currentSnapshot(), src0.sourceFormat)
    require(outcomes.forall(_.status == "SUCCESS"), outcomes.mkString(";"))
    // second half arrives as TWO micro-batches (maxFilesPerTrigger=1)
    Seq(0, 1).foreach { half =>
      raw.filter(col("event_id") % 2 === 1 && col("user_id") % 2 === half)
        .coalesce(1).write.parquet(s"$stage/half-$half")
      val part = new java.io.File(s"$stage/half-$half").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(stage, s"batch-$half.parquet"))
    }
    val stream = s.readStream.schema(raw.schema)
      .option("maxFilesPerTrigger", 1).parquet(stage)
    val q = graft.formats.iceberg.IcebergStreamSink
      .writeStream(stream, table, ckpt, appId = "graft_isink_gate")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // replay: a restarted stream re-offers batch 0 — must be a no-op
    require(!graft.formats.iceberg.IcebergStreamSink.appendBatch(s, table,
      raw.filter(col("event_id") % 2 === 1 && col("user_id") % 2 === 0),
      "graft_isink_gate", 0L),
      "replayed micro-batch was not skipped")
    new graft.formats.iceberg.IcebergConversionSource(s, table, "events")
      .toDataFrame
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), Gate.sumMeasure(col("value")).as("sum_v"))
      .orderBy("event_type")
  }

  val streamingIcebergSinkSql: String =
    s"""SELECT event_type, count(*) AS cnt,
       |  ${Gate.sumMeasureSql("value")} AS sum_v
       |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Exactly-once micro-batch appends into a Hudi COW table: seed half
    * the rows via a sync, stream the other half as two micro-batches
    * (txn stamps in commit extraMetadata), then prove a replayed batch
    * id is a no-op before the oracle-checked read-back.
    */
  def streamingHudiSink(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val stage = graft.util.TempDirs.create("graft_hsink_stage")
    val seedDir = graft.util.TempDirs.create("graft_hsink_seed")
    val table = graft.util.TempDirs.create("graft_hsink_hudi")
    val ckpt = graft.util.TempDirs.create("graft_hsink_ckpt")
    val raw = s.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"))
    raw.filter(col("event_id") % 2 === 0)
      .write.mode("overwrite").parquet(seedDir)
    val src0 = new graft.sources.ParquetDirectorySource(s, seedDir, "events")
    val outcomes = graft.sync.TableFormatSync.syncSnapshot(
      Seq(new graft.formats.hudi.HudiConversionTarget(s, table)),
      src0.currentSnapshot(), src0.sourceFormat)
    require(outcomes.forall(_.status == "SUCCESS"), outcomes.mkString(";"))
    Seq(0, 1).foreach { half =>
      raw.filter(col("event_id") % 2 === 1 && col("user_id") % 2 === half)
        .coalesce(1).write.parquet(s"$stage/half-$half")
      val part = new java.io.File(s"$stage/half-$half").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(stage, s"batch-$half.parquet"))
    }
    val stream = s.readStream.schema(raw.schema)
      .option("maxFilesPerTrigger", 1).parquet(stage)
    val q = graft.formats.hudi.HudiStreamSink
      .writeStream(stream, table, ckpt, appId = "graft_hsink_gate")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    require(!graft.formats.hudi.HudiStreamSink.appendBatch(s, table,
      raw.filter(col("event_id") % 2 === 1 && col("user_id") % 2 === 0),
      "graft_hsink_gate", 0L),
      "replayed micro-batch was not skipped")
    new graft.formats.hudi.HudiConversionSource(s, table, "events")
      .toDataFrame
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), Gate.sumMeasure(col("value")).as("sum_v"))
      .orderBy("event_type")
  }

  val streamingHudiSinkSql: String = streamingIcebergSinkSql

  /** The Paimon twin, on Paimon's own exactly-once convention:
    * (`commitUser`, `commitIdentifier`) stamped per snapshot.
    */
  def streamingPaimonSink(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val stage = graft.util.TempDirs.create("graft_psink_stage")
    val seedDir = graft.util.TempDirs.create("graft_psink_seed")
    val table = graft.util.TempDirs.create("graft_psink_paimon")
    val ckpt = graft.util.TempDirs.create("graft_psink_ckpt")
    val raw = s.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"))
    raw.filter(col("event_id") % 2 === 0)
      .write.mode("overwrite").parquet(seedDir)
    val src0 = new graft.sources.ParquetDirectorySource(s, seedDir, "events")
    val outcomes = graft.sync.TableFormatSync.syncSnapshot(
      Seq(new graft.formats.paimon.PaimonConversionTarget(s, table)),
      src0.currentSnapshot(), src0.sourceFormat)
    require(outcomes.forall(_.status == "SUCCESS"), outcomes.mkString(";"))
    Seq(0, 1).foreach { half =>
      raw.filter(col("event_id") % 2 === 1 && col("user_id") % 2 === half)
        .coalesce(1).write.parquet(s"$stage/half-$half")
      val part = new java.io.File(s"$stage/half-$half").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(stage, s"batch-$half.parquet"))
    }
    val stream = s.readStream.schema(raw.schema)
      .option("maxFilesPerTrigger", 1).parquet(stage)
    val q = graft.formats.paimon.PaimonStreamSink
      .writeStream(stream, table, ckpt, appId = "graft_psink_gate")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    require(!graft.formats.paimon.PaimonStreamSink.appendBatch(s, table,
      raw.filter(col("event_id") % 2 === 1 && col("user_id") % 2 === 0),
      "graft_psink_gate", 0L),
      "replayed micro-batch was not skipped")
    new graft.formats.paimon.PaimonConversionSource(s, table, "events")
      .toDataFrame
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), Gate.sumMeasure(col("value")).as("sum_v"))
      .orderBy("event_type")
  }

  val streamingPaimonSinkSql: String = streamingIcebergSinkSql

  /** Streaming SOURCE over a graft Delta table
    * (`spark.readStream.format("graft")`): half the events land as the
    * table's first commit and are served as the stream's initial
    * snapshot batch; the other half arrive as a second commit AFTER the
    * first run drained, and a checkpoint-resumed second run must deliver
    * exactly that commit's inserts — a re-served snapshot (double rows)
    * or a missed commit cannot hash-match the full-table oracle.
    */
  def streamingGraftSource(s: SparkSession, dir: String): DataFrame =
    streamingSourceGate(s, dir, "delta")

  val streamingGraftSourceSql: String =
    s"""SELECT event_type, count(*) AS cnt,
       |  ${Gate.sumMeasureSql("value")} AS sum_v
       |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** The streaming source over ICEBERG — offsets are snapshot sequence
    * numbers; the second commit arrives through an incremental metadata
    * sync rather than a row append, proving the source tails the
    * metadata plane itself, not a writer-side hook.
    */
  def streamingIcebergSource(s: SparkSession, dir: String): DataFrame =
    streamingSourceGate(s, dir, "iceberg")

  val streamingIcebergSourceSql: String = streamingGraftSourceSql

  /** The streaming source over HUDI — offsets are timeline instants; the
    * second commit is an incremental metadata sync and the tail batch
    * rides the read-optimized incremental feed.
    */
  def streamingHudiSource(s: SparkSession, dir: String): DataFrame =
    streamingSourceGate(s, dir, "hudi")

  val streamingHudiSourceSql: String = streamingGraftSourceSql

  /** The streaming source over PAIMON — offsets are snapshot ids; the
    * tail batch comes from the delta manifest's ADD entries.
    */
  def streamingPaimonSource(s: SparkSession, dir: String): DataFrame =
    streamingSourceGate(s, dir, "paimon")

  val streamingPaimonSourceSql: String = streamingGraftSourceSql

  private def streamingSourceGate(s: SparkSession, dir: String,
      fmt: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val table = graft.util.TempDirs.create(s"graft_src_$fmt")
    val seed = graft.util.TempDirs.create(s"graft_src_seed_$fmt")
    val out = graft.util.TempDirs.create(s"graft_src_out_$fmt")
    val ckpt = graft.util.TempDirs.create(s"graft_src_ckpt_$fmt")
    val raw = s.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"))

    def commitHalf(half: Int): Unit = fmt match {
      case "delta" =>
        graft.formats.delta.DeltaWrite.write(s, table,
          raw.filter(col("event_id") % 2 === half), overwrite = false)
      case _ =>
        raw.filter(col("event_id") % 2 === half)
          .write.mode("append").parquet(seed)
        val src = new graft.sources.ParquetDirectorySource(s, seed, "events")
        val target: graft.spi.ConversionTarget = fmt match {
          case "iceberg" =>
            new graft.formats.iceberg.IcebergConversionTarget(s, table)
          case "hudi" =>
            new graft.formats.hudi.HudiConversionTarget(s, table)
          case "paimon" =>
            new graft.formats.paimon.PaimonConversionTarget(s, table)
        }
        val outcomes = graft.sync.TableFormatSync.syncSnapshot(
          Seq(target), src.currentSnapshot(), src.sourceFormat)
        require(outcomes.forall(_.status == "SUCCESS"),
          outcomes.mkString(";"))
    }

    def drainOnce(): Unit = {
      val q = s.readStream.format("graft").load(table)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // phase attribution (bench `phases` key, r11 ask: one 2x outlier in
    // streaming_paimon_source's median-of-3) — the table COMMITS and the
    // stream DRAINS get separate timers so a spike attributes
    import graft.util.PhaseTimer
    PhaseTimer.time(s"streaming_${fmt}_source.commit1")(commitHalf(0))
    PhaseTimer.time(s"streaming_${fmt}_source.drain1")(drainOnce())
    PhaseTimer.time(s"streaming_${fmt}_source.commit2")(commitHalf(1))
    // checkpoint resume — must serve ONLY commit 2
    PhaseTimer.time(s"streaming_${fmt}_source.drain2")(drainOnce())
    s.read.parquet(out)
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), Gate.sumMeasure(col("value")).as("sum_v"))
      .orderBy("event_type")
  }
}
