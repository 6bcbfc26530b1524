package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingOps

/** The 10^6-KEY probe for the STATEFUL streaming operators — the last
  * extrapolated 100 TB claim after MillionFileScaleSpec (sync plane) and
  * MillionDocScaleSpec (pipeline plane): the prior stateful gates run at
  * ~10^3 keys, so state-store behavior at production key cardinality was
  * argued, not observed. Each case drives a stateful operator with a
  * million distinct state keys, asserts the RESULT exactly (planted
  * structure), bounds wall time generously (a guard against accidental
  * per-key driver work, not a benchmark), and records the state-store
  * rows/bytes the engine actually held (SCALE.md per round).
  */
class MillionKeyStreamingSpec extends SparkSuite {

  private val n = 1000000L

  private def timed[T](what: String)(f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    val sec = (System.nanoTime() - t0) / 1e9
    info(f"$what: $sec%.1f s")
    (r, sec)
  }

  private def stateInfo(q: org.apache.spark.sql.streaming.StreamingQuery)
      : String = {
    val ops = Option(q.lastProgress).toSeq.flatMap(_.stateOperators.toSeq)
    ops.map(o => s"rows=${o.numRowsTotal} bytes=${o.memoryUsedBytes}")
      .mkString("; ")
  }

  test("windowed agg at 1M distinct (window x user) keys: every window " +
    "finalizes exactly once, state stays O(open windows)") {
    val stage = tmpDir("mks_window")
    val baseUs = 1700000000000000L
    // hour H: one event per user; +3h: one closer event per 1000th user
    // (advances the watermark past H's window end so H finalizes)
    val events = spark.range(n).select(
      col("id").as("event_id"),
      timestamp_micros(lit(baseUs) + (col("id") % 3600) * 1000000L)
        .as("ts"),
      col("id").as("user_id"),
      lit("view").as("event_type"),
      lit(1.5).as("value"))
      .unionByName(spark.range(n / 1000).select(
        (col("id") + n).as("event_id"),
        timestamp_micros(lit(baseUs) + lit(3L * 3600 * 1000000L))
          .as("ts"),
        col("id").as("user_id"),
        lit("view").as("event_type"),
        lit(1.5).as("value")))
    events.coalesce(2).write.mode("overwrite").parquet(stage)
    val schema = spark.read.parquet(stage).schema

    val (_, sec) = timed("1M-key windowed agg") {
      val q = StreamingOps.withStatePartitions(spark, 32) {
        StreamingOps.eventStream(spark, stage, schema)
          .withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "1 hour"), col("user_id"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("user_id"), col("n_events"))
          .writeStream.outputMode("append").format("memory")
          .queryName("mks_window_out")
          .trigger(Trigger.AvailableNow()).start()
      }
      q.awaitTermination()
      info(s"window state: ${stateInfo(q)}")
    }
    val out = spark.table("mks_window_out")
    // exactly the 1M hour-H windows finalized; the +3h windows are still
    // open (watermark short of their end) and must NOT have emitted
    assert(out.count() == n, "every hour-H window exactly once")
    assert(out.agg(countDistinct(col("user_id"))).head().getLong(0) == n)
    assert(out.agg(max(col("n_events"))).head().getLong(0) == 1L)
    assert(sec < 900, s"windowed agg too slow: $sec")
    spark.sql("DROP TABLE IF EXISTS mks_window_out")
  }

  test("sessionize at 1M distinct users: per-user state tracks the " +
    "30-minute gap rule at full key cardinality") {
    import spark.implicits._
    val stage = tmpDir("mks_sess")
    val baseUs = 1700000000000000L
    // two events per user, 2h apart -> exactly 2 sessions each
    val events = spark.range(n).select(
      col("id").as("event_id"),
      timestamp_micros(lit(baseUs) + col("id") % 60 * 1000000L).as("ts"),
      col("id").as("user_id"),
      lit("view").as("event_type"), lit(1.0).as("value"))
      .unionByName(spark.range(n).select(
        (col("id") + n).as("event_id"),
        timestamp_micros(lit(baseUs) + lit(2L * 3600 * 1000000L) +
          col("id") % 60 * 1000000L).as("ts"),
        col("id").as("user_id"),
        lit("view").as("event_type"), lit(1.0).as("value")))
    events.coalesce(2).write.mode("overwrite").parquet(stage)
    val schema = spark.read.parquet(stage).schema

    val (_, sec) = timed("1M-user sessionize") {
      val q = StreamingOps.withStatePartitions(spark, 32) {
        val stream = StreamingOps.eventStream(spark, stage, schema)
          .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
            col("user_id"), col("event_type"), col("value"))
          .as[StreamingOps.Event]
        StreamingOps.sessionCounts(spark, stream)
          .writeStream.outputMode("append").format("memory")
          .queryName("mks_sess_out")
          .trigger(Trigger.AvailableNow()).start()
      }
      q.awaitTermination()
      info(s"session state: ${stateInfo(q)}")
    }
    val out = spark.table("mks_sess_out")
      .groupBy("user_id")
      .agg(max("n_sessions").as("sessions"), sum("n_events").as("events"))
    assert(out.count() == n)
    val mm = out.agg(min("sessions"), max("sessions"),
      min("events"), max("events")).head()
    assert(mm.getLong(0) == 2L && mm.getLong(1) == 2L,
      s"every user sees exactly 2 sessions: $mm")
    assert(mm.getLong(2) == 2L && mm.getLong(3) == 2L)
    assert(sec < 900, s"sessionize too slow: $sec")
    spark.sql("DROP TABLE IF EXISTS mks_sess_out")
  }

  test("streaming minhash at >1M band-bucket state keys: planted pairs " +
    "recovered exactly, state is O(docs x bands)") {
    val docs = 125000L
    val clustered = 20000L // 5k clusters of 4 identical docs
    val truePairs = 5000L * 6
    val stage = tmpDir("mks_minhash")
    val corpus = spark.range(docs).select(col("id"),
      when(col("id") < clustered, floor(col("id") / 4))
        .otherwise(col("id") + docs).as("seed"))
      .select(col("id"), concat_ws(" ",
        transform(sequence(lit(0), lit(23)),
          i => hex(xxhash64(col("seed"), i)))).as("text"))
    corpus.coalesce(2).write.mode("overwrite").parquet(stage)
    val batch = spark.read.parquet(stage)

    val (_, sec) = timed("125k-doc streaming minhash (16 bands -> ~1.7M " +
      "state keys)") {
      val q = StreamingOps.withStatePartitions(spark, 32) {
        val stream = spark.readStream.schema(batch.schema).parquet(stage)
        StreamingOps.streamingMinhashPairs(stream, batch, "id", "text")
          .writeStream.outputMode("append").format("memory")
          .queryName("mks_minhash_out")
          .trigger(Trigger.AvailableNow()).start()
      }
      q.awaitTermination()
      info(s"minhash state: ${stateInfo(q)}")
    }
    val pairs = spark.table("mks_minhash_out")
      .select("doc_a", "doc_b").distinct()
    assert(pairs.count() == truePairs,
      s"expected $truePairs planted pairs")
    assert(sec < 900, s"streaming minhash too slow: $sec")
    spark.sql("DROP TABLE IF EXISTS mks_minhash_out")
  }
}
