package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface. The reference has no streaming engine —
  * its incremental sync is a poll loop (§2.9) — but the engine's users get
  * real streams: the same event analytics that run in batch
  * (EventsQueries) run here under readStream with watermarks, plus a
  * stateful sessionizer via flatMapGroupsWithState.
  */
object StreamingOps {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class SessionState(count: Long, lastTsMicros: Long)
  case class SessionUpdate(user_id: Long, n_sessions: Long, n_events: Long)

  /** Run `body` — which STARTS streaming queries — with the session's
    * `spark.sql.shuffle.partitions` set to `n`, restoring the previous
    * value before returning. For a stateful streaming query the shuffle
    * partition count at first batch becomes the query's STATE partition
    * count, pinned in the checkpoint for the query's whole life — so it
    * is a per-query capacity decision, not a session default: every
    * micro-batch opens, commits and snapshots one state store per
    * partition, a fixed cost paid whether or not the partition holds
    * state. Size it to the expected state (keys × bytes), not to the
    * cluster: a 100-TB attribution join wants hundreds of partitions; a
    * gate-scale window agg wants single digits. Safe to restore eagerly:
    * `start()` clones the session, so the running stream keeps `n` while
    * the caller's session reverts.
    */
  def withStatePartitions[T](spark: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body finally spark.conf.set(key, prev)
  }

  /** File stream over an events parquet directory (micro-batch source).
    * `ts` normalizes to a session-zone micros timestamp whatever the
    * file's shipped representation (long nanos / TIMESTAMP_NTZ / LTZ —
    * graft.queries.Tables.normalizeTs, same dispatch on the batch path).
    */
  def eventStream(spark: SparkSession, dir: String, schema: StructType)
      : DataFrame =
    graft.queries.Tables.normalizeTs(
      spark.readStream.schema(schema).parquet(dir))

  /** Tumbling 1-hour windowed counts with a watermark — the streaming
    * form of EventsQueries.hourlyCounts, emitting the identical gate-safe
    * representation (exact micros sum → double): a micro-batch partial
    * sum and the batch plan produce bit-identical results. In append mode
    * the watermark defines BOTH when a window finalizes and which late
    * rows are dropped (window end ≤ watermark).
    */
  def windowedCounts(events: DataFrame, delay: String = "2 hours")
      : DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(graft.queries.Gate.micros(col("value"))).as("sum_micros"))
      .select(unix_micros(col("window.start")).as("hour_us"),
        col("event_type"), col("n_events"),
        graft.queries.Gate.microsToDouble(col("sum_micros")).as("sum_value"))

  /** Plain file stream (no column coercion) — for non-event tables.
    * `options` go on the SOURCE (readStream) — e.g. maxFilesPerTrigger,
    * which is a file-source option and is silently ignored if set on the
    * write side.
    */
  def fileStream(spark: SparkSession, dir: String, schema: StructType,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.readStream.options(options).schema(schema).parquet(dir)

  /** Streaming exact dedup — the streaming form of `Dedup.exact`: per
    * content-hash keeper + copy count as a stateful streaming aggregation
    * (complete mode). The state store holds one row per DISTINCT hash, so
    * state is bounded by unique content, not stream length; `min(id)` as
    * the keeper makes the answer independent of arrival order — the same
    * documents produce the same keepers in any micro-batch interleaving,
    * and bit-identical to the batch plan.
    */
  def streamingExactDedup(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n_copies"))

  /** Stream-stream INTERVAL JOIN: left-type events joined to same-user
    * right-type events that follow within `withinMicros`. Both sides are
    * watermarked and the join condition carries the event-time range, so
    * each side's buffered state is bounded by the interval + watermark
    * delay — the attribution-join shape (view → purchase within an hour)
    * at any stream length. Inner join: pairs emit as soon as both sides
    * have arrived, independent of watermark progress.
    */
  def intervalJoin(events: DataFrame, leftType: String, rightType: String,
      withinMicros: Long, delay: String = "1 hour"): DataFrame = {
    val l = events.filter(col("event_type") === leftType)
      .select(col("user_id"), col("ts").as("l_ts"),
        col("event_id").as("l_id"))
      .withWatermark("l_ts", delay)
    val r = events.filter(col("event_type") === rightType)
      .select(col("user_id").as("r_user"), col("ts").as("r_ts"),
        col("event_id").as("r_id"), col("value").as("r_value"))
      .withWatermark("r_ts", delay)
    l.join(r,
      col("user_id") === col("r_user") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $withinMicros MICROSECOND"))
  }

  /** Streaming MinHash-LSH near-dup — the streaming twin of
    * `Dedup.minHashLsh`: documents arrive as a stream, each computes its
    * band keys in the same codegen'd native-expression pass the batch
    * plan uses, and a stateful band-bucket membership emits CANDIDATE
    * pairs (a new doc against every doc previously seen in its bucket).
    * Candidates then verify by exact Jaccard through stream-static joins
    * against the full corpus' shingle sets.
    *
    * Semantics: the verified pair SET equals the batch operator's output
    * for any micro-batch interleaving — pairs are normalized (a<b) and a
    * pair sharing k bands may emit up to k times (at-least-once;
    * consumers dedup on (doc_a, doc_b), which the gate does with one
    * distinct at read-back). State per bucket is the doc-id list — the
    * same O(docs x bands) the batch shuffle materializes, but spread
    * across the stream's lifetime and sized by `withStatePartitions`.
    */
  def streamingMinhashPairs(docs: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, threshold: Double = 0.7,
      numHashes: Int = 64, bands: Int = 16): DataFrame = {
    import docs.sparkSession.implicits._
    // OUTER explode + post-filter (same rationale as Dedup.minHashLsh):
    // the non-outer form's inferred generate filter re-evaluated the
    // 64-hash minhash pass 3x per row in EVERY micro-batch's scan task —
    // the gate's whole batch0/batch1 cost mystery (7.8 -> 2.8 s once
    // audited); row-identical since keys is never null/empty here
    val banded = graft.operators.Dedup.shingleSets(docs, idCol, textCol)
      .select(col("doc"), graft.functions.SketchFunctions
        .minhash_band_keys(col("shingles"), numHashes, bands).as("keys"))
      .select(col("doc"), posexplode_outer(col("keys")).as(Seq("band", "bkey")))
      .filter(col("bkey").isNotNull)
      .select(col("doc").as("doc_id"),
        concat_ws(":", col("band"), col("bkey")).as("bucket"))
      .as[(Long, String)]
    val candidates = banded.groupByKey(_._2)
      .flatMapGroupsWithState[Seq[Long], (Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (_: String, batch: Iterator[(Long, String)],
            state: GroupState[Seq[Long]]) => {
          val prior = state.getOption.getOrElse(Seq.empty)
          val fresh = batch.map(_._1).toSeq.distinct.sorted
            .filterNot(prior.contains)
          state.update(prior ++ fresh)
          // each fresh doc pairs with everything already in the bucket
          // (prior and earlier-in-this-batch), normalized a < b
          val out = scala.collection.mutable.Buffer.empty[(Long, Long)]
          var seen = prior
          for (d <- fresh) {
            seen.foreach(p =>
              out += (if (p < d) (p, d) else (d, p)))
            seen = seen :+ d
          }
          out.iterator
        })
      .toDF("doc_a", "doc_b")
    val grams = graft.operators.Dedup
      .shingleSets(corpus, idCol, textCol).cache()
    candidates
      .join(grams.withColumnRenamed("doc", "doc_a")
        .withColumnRenamed("shingles", "sh_a"), Seq("doc_a"))
      .join(grams.withColumnRenamed("doc", "doc_b")
        .withColumnRenamed("shingles", "sh_b"), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        graft.operators.Dedup.jaccard(col("sh_a"), col("sh_b"))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Stateful session counting: a >30 min gap starts a new session.
    * Custom state via flatMapGroupsWithState (KeyValueGroupedDataset),
    * emitting one update per user per micro-batch.
    */
  def sessionCounts(spark: SparkSession, events: Dataset[Event])
      : Dataset[SessionUpdate] = {
    import spark.implicits._
    val gapMicros = 30L * 60 * 1000000
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (userId: Long, batch: Iterator[Event],
            state: GroupState[SessionState]) => {
          val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue))
          var events = 0L
          for (e <- sorted) {
            val tsMicros = e.ts.getTime * 1000L
            val newSession = st.lastTsMicros == Long.MinValue ||
              tsMicros - st.lastTsMicros > gapMicros
            st = SessionState(st.count + (if (newSession) 1 else 0), tsMicros)
            events += 1
          }
          state.update(st)
          if (events == 0) Iterator.empty
          else Iterator(SessionUpdate(userId, st.count, events))
        })
  }
}
