package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingOps

class StreamingSpec extends SparkSuite {

  /** readStream needs a directory: stage the events file into one. */
  private lazy val eventsDir: String = {
    val d = tmpDir("stream_events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sf("sf0.001/events.parquet")),
      java.nio.file.Paths.get(d, "events.parquet"))
    d
  }

  test("streaming windowed counts match the batch query") {
    import spark.implicits._
    val raw = spark.read.parquet(sf("sf0.001/events.parquet"))
    val stream = StreamingOps.eventStream(spark, eventsDir, raw.schema)
    val q = StreamingOps.windowedCounts(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("win_out")
      .select("hour_us", "event_type", "n_events")
      .orderBy("hour_us", "event_type").collect().toSeq
    val batch = graft.queries.EventsQueries.hourlyCounts(spark, sf("sf0.001"))
      .select("hour_us", "event_type", "n_events")
      .orderBy("hour_us", "event_type").collect().toSeq
    assert(streamed == batch)
  }

  test("streaming exact dedup matches the batch dedup, in two micro-batches") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    // two files → two micro-batches: the stateful agg must merge state
    // across batches, not just within one
    val d = tmpDir("stream_dedup")
    val docs = spark.read.parquet(sf("sf0.001/documents.parquet"))
    docs.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.parquet(s"$d/half_a")
    docs.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.parquet(s"$d/half_b")
    val in = tmpDir("stream_dedup_in")
    var i = 0
    for (half <- Seq("half_a", "half_b")) {
      val part = Files.list(Paths.get(d, half)).toArray
        .map(_.toString).filter(_.endsWith(".parquet")).head
      Files.copy(Paths.get(part), Paths.get(in, s"$i.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      i += 1
    }
    // maxFilesPerTrigger is a file-SOURCE option: on the read side it
    // forces one file per micro-batch; set on writeStream it is silently
    // ignored (and this test would run a single batch)
    val stream = StreamingOps.fileStream(spark, in, docs.schema,
      Map("maxFilesPerTrigger" -> "1"))
    val q = StreamingOps.streamingExactDedup(stream, "doc_id", "text")
      .writeStream.outputMode("complete").format("memory")
      .queryName("dedup_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // the cross-batch state-merge claim needs >1 batch to mean anything
    val batches = q.recentProgress.count(_.numInputRows > 0)
    assert(batches >= 2, s"expected >=2 micro-batches, saw $batches")
    val streamed = spark.table("dedup_out")
      .orderBy("content_hash").collect().toSeq
    val batch = graft.operators.Dedup.exact(docs, "doc_id", "text")
      .orderBy("content_hash").collect().toSeq
    assert(streamed.map(_.toString) == batch.map(_.toString))
  }

  test("streaming sync converts incrementally as files land") {
    import java.nio.file.{Files, Paths}
    val dataDir = tmpDir("ssync_data")
    val target = tmpDir("ssync_delta")
    val ckpt = tmpDir("ssync_ckpt")
    val srcFile = Paths.get(sf("sf0.001/region.parquet"))
    Files.copy(srcFile, Paths.get(dataDir, "f1.parquet"))
    Paths.get(dataDir, "f1.parquet").toFile.setLastModified(1000000L)

    // catch-up run: converts what exists, then stops
    val q1 = graft.streaming.StreamingSync.start(spark, dataDir, "region",
      Seq(new graft.formats.delta.DeltaConversionTarget(spark, target)),
      ckpt, availableNow = true)
    q1.awaitTermination(120000)
    assert(new graft.formats.delta.DeltaConversionSource(
      spark, target, "region").currentSnapshot().files.count() == 1)

    // second file: the next run picks it up as an INCREMENTAL commit
    Files.copy(srcFile, Paths.get(dataDir, "f2.parquet"))
    Paths.get(dataDir, "f2.parquet").toFile.setLastModified(2000000L)
    val q2 = graft.streaming.StreamingSync.start(spark, dataDir, "region",
      Seq(new graft.formats.delta.DeltaConversionTarget(spark, target)),
      ckpt, availableNow = true)
    q2.awaitTermination(120000)
    val src = new graft.formats.delta.DeltaConversionSource(
      spark, target, "region")
    assert(src.currentSnapshot().files.count() == 2)
    // two separate Delta commits — the stream really synced incrementally
    assert(graft.formats.delta.DeltaLog.listVersions(target,
      new org.apache.hadoop.conf.Configuration()).size == 2)
  }

  test("writer-side hook syncs the conversion as part of every write") {
    import java.nio.file.{Files, Paths}
    val inDir = tmpDir("hook_in")
    val outDir = tmpDir("hook_out")
    val ckpt = tmpDir("hook_ckpt")
    val target = tmpDir("hook_delta")
    Files.copy(Paths.get(sf("sf0.001/region.parquet")),
      Paths.get(inDir, "f1.parquet"))

    // streaming path: a parquet-writing query with the listener attached —
    // every committed micro-batch re-syncs the conversion target
    val raw = spark.read.parquet(sf("sf0.001/region.parquet"))
    val listener = new graft.sync.SyncOnWriteListener("hook_writer",
      () => new graft.sources.ParquetDirectorySource(spark, outDir, "region"),
      () => Seq(new graft.formats.delta.DeltaConversionTarget(spark, target)))
    spark.streams.addListener(listener)
    try {
      val q = spark.readStream.schema(raw.schema).parquet(inDir)
        .writeStream.queryName("hook_writer")
        .format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      // progress events drain asynchronously on the listener bus
      val deadline = System.currentTimeMillis() + 60000
      while (listener.batchesSynced < 1 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(listener.batchesSynced >= 1)
      assert(listener.lastOutcomes.nonEmpty &&
        listener.lastOutcomes.forall(_.status == "SUCCESS"),
        listener.lastOutcomes.toString)
      val synced = new graft.formats.delta.DeltaConversionSource(
        spark, target, "region")
      assert(graft.formats.delta.DeltaRead
        .toDataFrame(spark, synced.currentSnapshot()).count() == raw.count())
    } finally spark.streams.removeListener(listener)

    // batch path: write + sync in one call (the direct XTableSyncTool shape)
    val batchTarget = tmpDir("hook_delta2")
    val out = graft.sync.SyncOnWrite.afterWrite(
      raw.write.mode("append").parquet(outDir),
      () => new graft.sources.ParquetDirectorySource(spark, outDir, "region"),
      () => Seq(new graft.formats.delta.DeltaConversionTarget(spark, batchTarget)))
    assert(out.forall(_.status == "SUCCESS"), out.toString)
    assert(graft.formats.delta.DeltaRead.toDataFrame(spark,
      new graft.formats.delta.DeltaConversionSource(spark, batchTarget, "region")
        .currentSnapshot()).count() >= raw.count())
  }

  test("stateful sessionizer matches batch sessionization") {
    import spark.implicits._
    val raw = spark.read.parquet(sf("sf0.001/events.parquet"))
    val stream = StreamingOps.eventStream(spark, eventsDir, raw.schema)
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .as[StreamingOps.Event]
    val q = StreamingOps.sessionCounts(spark, stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    // single micro-batch → one update per user; compare with batch result
    val streamed = spark.table("sess_out")
      .groupBy("user_id").agg(max("n_sessions").as("n_sessions"))
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val batch = graft.queries.EventsQueries.sessionize(spark, sf("sf0.001"))
      .select("user_id", "n_sessions")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(streamed == batch)
  }

  test("append-mode watermark drops exactly the late closed windows") {
    val got = graft.queries.EventsQueries
      .streamingLateData(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq

    // independent recomputation of the drop model: watermark after the
    // on-time batch is (ms-floored max event time − 240 h); a late row
    // survives iff its 1-hour window end is strictly above it
    val raw = graft.queries.Tables.normalizeTs(
        spark.read.parquet(sf("sf0.001/events.parquet")))
      .withColumn("ts_us", unix_micros(col("ts")))
    val onTime = raw.filter(col("event_id") % 5 =!= 0)
    val late = raw.filter(col("event_id") % 5 === 0)
    val maxUs = onTime.agg(max("ts_us")).head().getLong(0)
    val wmUs = (maxUs / 1000 - 240L * 3600 * 1000) * 1000
    val hourUs = 3600L * 1000000
    val keptLate = late.filter(
      (floor(col("ts_us") / hourUs) + 1) * hourUs > wmUs)
    val droppedLate = late.count() - keptLate.count()
    assert(droppedLate > 0, "no late rows dropped — degenerate fixture")
    assert(keptLate.count() > 0, "no late rows kept — degenerate fixture")
    val want = onTime.union(keptLate)
      .groupBy((floor(col("ts_us") / hourUs) * hourUs).as("hour_us"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        graft.queries.Gate.sumMeasure(col("value")).as("sum_value"))
      .orderBy("hour_us", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == want)
  }

  test("stream-stream interval join buffers across micro-batches") {
    import java.nio.file.{Files, Paths}
    val stage = tmpDir("stream_ij")
    val raw = spark.read.parquet(sf("sf0.001/events.parquet"))
    val rawTs = graft.queries.Tables.normalizeTs(raw)
    def stageBatch(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = tmpDir("stream_ij_tmp")
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath, Paths.get(stage, s"$name.parquet"))
    }
    val stream = StreamingOps.eventStream(spark, stage, raw.schema)
    val q = StreamingOps
      .intervalJoin(stream, "view", "purchase", 3600L * 1000000)
      .writeStream.outputMode("append").format("memory")
      .queryName("ij_out").start()
    // ALL views land in batch 1, ALL purchases in batch 2: every emitted
    // pair crosses the batch boundary through buffered join state
    stageBatch(raw.filter(col("event_type") === "view"), "views")
    q.processAllAvailable()
    stageBatch(raw.filter(col("event_type") =!= "view"), "rest")
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ij_out")
      .select("l_id", "r_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val v = rawTs.filter(col("event_type") === "view")
      .select(col("user_id"), unix_micros(col("ts")).as("l_us"),
        col("event_id").as("l_id"))
    val p = rawTs.filter(col("event_type") === "purchase")
      .select(col("user_id").as("r_user"), unix_micros(col("ts")).as("r_us"),
        col("event_id").as("r_id"))
    val want = v.join(p, col("user_id") === col("r_user") &&
        col("r_us") >= col("l_us") &&
        col("r_us") <= col("l_us") + 3600L * 1000000)
      .select("l_id", "r_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty, "degenerate fixture: no view→purchase pairs")
    assert(got == want)
  }

  test("delta stream sink: exactly-once across replays, loud on drift") {
    import graft.formats.delta.{DeltaConversionSource, DeltaStreamSink}
    val t = tmpDir("sink_delta")
    val rows = spark.read.parquet(sf("sf0.001/nation.parquet"))
    // batch 0 creates the table, batch 1 appends
    assert(DeltaStreamSink.appendBatch(spark, t, rows, "app", 0L))
    assert(DeltaStreamSink.appendBatch(spark, t,
      rows.withColumn("n_nationkey", col("n_nationkey") + 100), "app", 1L))
    // replays of both batches are skipped — rows land exactly once
    assert(!DeltaStreamSink.appendBatch(spark, t, rows, "app", 0L))
    assert(!DeltaStreamSink.appendBatch(spark, t, rows, "app", 1L))
    assert(DeltaStreamSink.lastTxnVersion(spark, t, "app").contains(1L))
    // a DIFFERENT appId has its own txn ledger
    assert(DeltaStreamSink.lastTxnVersion(spark, t, "other").isEmpty)
    assert(new DeltaConversionSource(spark, t, "nation")
      .toDataFrame.count() == 2 * rows.count())
    // schema drift refuses loudly
    val e = intercept[IllegalArgumentException] {
      DeltaStreamSink.appendBatch(spark, t,
        rows.drop("n_regionkey"), "app", 2L)
    }
    assert(e.getMessage.contains("schema"))
  }

  private def seededTable(prefix: String,
      mk: String => Unit): (String, org.apache.spark.sql.DataFrame) = {
    val t = tmpDir(prefix)
    mk(t)
    (t, spark.read.parquet(sf("sf0.001/nation.parquet")))
  }

  test("hudi stream sink: exactly-once across replays") {
    import graft.formats.hudi.{HudiConversionSource, HudiStreamSink}
    val seed = tmpDir("sink_hudi_seed")
    spark.read.parquet(sf("sf0.001/nation.parquet"))
      .write.mode("overwrite").parquet(seed)
    val (t, rows) = seededTable("sink_hudi", { t =>
      val src = new graft.sources.ParquetDirectorySource(spark, seed, "nation")
      val o = graft.sync.TableFormatSync.syncSnapshot(
        Seq(new graft.formats.hudi.HudiConversionTarget(spark, t)),
        src.currentSnapshot(), src.sourceFormat)
      assert(o.forall(_.status == "SUCCESS"), o.mkString(";"))
    })
    assert(HudiStreamSink.appendBatch(spark, t, rows, "app", 0L))
    assert(HudiStreamSink.appendBatch(spark, t, rows, "app", 1L))
    // replays of both batches skip — rows land exactly once
    assert(!HudiStreamSink.appendBatch(spark, t, rows, "app", 0L))
    assert(!HudiStreamSink.appendBatch(spark, t, rows, "app", 1L))
    assert(HudiStreamSink.lastTxnVersion(spark, t, "app").contains(1L))
    assert(HudiStreamSink.lastTxnVersion(spark, t, "other").isEmpty)
    assert(new HudiConversionSource(spark, t, "nation")
      .toDataFrame.count() == 3 * rows.count())
  }

  test("paimon stream sink: exactly-once across replays") {
    import graft.formats.paimon.{PaimonConversionSource, PaimonStreamSink}
    val seed = tmpDir("sink_paimon_seed")
    spark.read.parquet(sf("sf0.001/nation.parquet"))
      .write.mode("overwrite").parquet(seed)
    val (t, rows) = seededTable("sink_paimon", { t =>
      val src = new graft.sources.ParquetDirectorySource(spark, seed, "nation")
      val o = graft.sync.TableFormatSync.syncSnapshot(
        Seq(new graft.formats.paimon.PaimonConversionTarget(spark, t)),
        src.currentSnapshot(), src.sourceFormat)
      assert(o.forall(_.status == "SUCCESS"), o.mkString(";"))
    })
    assert(PaimonStreamSink.appendBatch(spark, t, rows, "app", 0L))
    assert(PaimonStreamSink.appendBatch(spark, t, rows, "app", 1L))
    assert(!PaimonStreamSink.appendBatch(spark, t, rows, "app", 0L))
    assert(!PaimonStreamSink.appendBatch(spark, t, rows, "app", 1L))
    assert(PaimonStreamSink.lastTxnVersion(spark, t, "app").contains(1L))
    assert(PaimonStreamSink.lastTxnVersion(spark, t, "other").isEmpty)
    assert(new PaimonConversionSource(spark, t, "nation")
      .toDataFrame.count() == 3 * rows.count())
  }
}
