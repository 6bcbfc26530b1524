package graft

import graft.formats.delta._
import graft.model._
import graft.sources.ParquetDirectorySource
import graft.sync.{ConversionController, TableFormatSync}

/** SURVEY §7.3 concurrency & idempotence: losing a commit race must fail
  * loudly (optimistic concurrency), and re-syncing is a no-op (covered in
  * DeltaSyncSpec).
  */
class ConcurrencySpec extends SparkSuite {

  test("commit CAS: second writer of the same version loses") {
    val target = tmpDir("race_delta")
    assert(DeltaLog.writeCommit(target, 0L, Iterator("""{"commitInfo":{}}""")))
    // the losing writer gets false back and must not clobber
    assert(!DeltaLog.writeCommit(target, 0L, Iterator("""{"commitInfo":{"x":1}}""")))
    val content = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(DeltaLog.versionFile(target, 0L))))
    assert(!content.contains("\"x\""))
  }

  test("commit CAS under a true race: exactly one concurrent writer wins") {
    // rename(2) silently replaces an existing target, so exists-check +
    // move is TOCTOU-racy (both writers "succeed", one commit lost); the
    // hard-link publish must let exactly one of N simultaneous writers win.
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val target = tmpDir("truerace_delta")
    val n = 8
    val pool = Executors.newFixedThreadPool(n)
    val start = new CountDownLatch(1)
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    (0 until n).foreach { i =>
      pool.execute { () =>
        start.await()
        if (DeltaLog.writeCommit(target, 7L,
            Iterator(s"""{"commitInfo":{"writer":$i}}""")))
          wins.incrementAndGet()
      }
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(30, TimeUnit.SECONDS))
    assert(wins.get() == 1, s"${wins.get()} writers claimed the same version")
    // and the surviving content is one winner's, intact
    val content = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(DeltaLog.versionFile(target, 7L))))
    assert(content.matches("""\{"commitInfo":\{"writer":\d\}\}\n"""))
  }

  test("overlapping full syncs converge to the same live set") {
    val target = tmpDir("overlap_delta")
    val src = new ParquetDirectorySource(spark,
      sf("sf0.001/region.parquet"), "region")
    val snap = src.currentSnapshot()

    // writer A stages its snapshot diff against the (empty) table...
    val a = new DeltaConversionTarget(spark, target)
    a.beginSync(snap.table)
    a.syncMetadata(graft.spi.SyncMetadata(snap.commitId, Nil,
      src.sourceFormat, snap.table.basePath))
    a.syncSchema(snap.table.schema)
    a.syncPartitionSpec(snap.table.partitionFields)
    a.syncFilesForSnapshot(snap.files)

    // ...writer B completes a full sync first (wins version 0)
    val rb = TableFormatSync.syncSnapshot(
      Seq(new DeltaConversionTarget(spark, target)), src.currentSnapshot(),
      src.sourceFormat)
    assert(rb.forall(_.status == "SUCCESS"))

    // A commits its (now-stale) adds as version 1 — re-adding the same
    // canonical paths is idempotent under log replay, so the live set
    // stays correct
    a.completeSync()
    val back = new DeltaConversionSource(spark, target, "region")
    assert(back.currentSnapshot().files.count() == 1)
    assert(back.toDataFrame.count() ==
      spark.read.parquet(sf("sf0.001/region.parquet")).count())
  }

  test("source commits landing DURING sync are never lost, syncs stay green") {
    // The reference's concurrent-writer torture (ITConversionController
    // .java:370-403): a writer keeps committing to the SOURCE table while
    // syncs run. Every sync must see a consistent pinned snapshot (no
    // partial commit, no error), and a final sync must land every commit
    // the writer made — nothing lost, re-sync idempotent.
    val srcTable = tmpDir("cw_delta_src")
    val iceTable = tmpDir("cw_ice_tgt")
    val seed = new ParquetDirectorySource(spark,
      sf("sf0.001/region.parquet"), "region")
    assert(TableFormatSync.syncSnapshot(
      Seq(new DeltaConversionTarget(spark, srcTable)),
      seed.currentSnapshot(), seed.sourceFormat)
      .forall(_.status == "SUCCESS"))
    val rowsPerFile =
      spark.read.parquet(sf("sf0.001/region.parquet")).count()

    val nCommits = 20
    val conf = graft.util.HadoopConfs.session(spark)
    val writerErr = new java.util.concurrent.atomic.AtomicReference[Throwable]
    val committed = new java.util.concurrent.atomic.AtomicInteger(0)
    // deterministic interleave: the writer lands half its commits, WAITS
    // for a sync to complete on the partial state, then lands the rest —
    // so at least one sync provably ran mid-stream
    val syncedMidStream = new java.util.concurrent.CountDownLatch(1)
    val writer = new Thread(() => {
      try {
        (1 to nCommits).foreach { k =>
          if (k == nCommits / 2 + 1)
            assert(syncedMidStream.await(
              60, java.util.concurrent.TimeUnit.SECONDS))
          val name = f"part-c$k%05d.parquet"
          java.nio.file.Files.copy(
            java.nio.file.Paths.get(sf("sf0.001/region.parquet")),
            java.nio.file.Paths.get(srcTable, name))
          val size = java.nio.file.Files.size(
            java.nio.file.Paths.get(srcTable, name))
          // CAS loop: the sync never writes to the source log, but the
          // writer must still claim versions the safe way
          var v = DeltaLog.listVersions(srcTable, conf).last + 1
          while (!DeltaLog.writeCommit(srcTable, v, Iterator(
              s"""{"add":{"path":"$name","partitionValues":{},""" +
                s""""size":$size,"modificationTime":${1000000L + k},""" +
                s""""dataChange":true,""" +
                s""""stats":"{\\"numRecords\\":$rowsPerFile}"}}"""))) {
            v += 1
          }
          committed.incrementAndGet()
          Thread.sleep(5)
        }
      } catch { case t: Throwable => writerErr.set(t) }
    })

    val controller = new ConversionController
    def dsrc = new DeltaConversionSource(spark, srcTable, "region")
    var syncs = 0
    writer.start()
    while (writer.isAlive) {
      val out = controller.sync(dsrc,
        Seq(new graft.formats.iceberg.IcebergConversionTarget(spark, iceTable)))
      assert(out.forall(_.status == "SUCCESS"),
        s"sync failed mid-write: ${out.mkString(";")}")
      syncs += 1
      syncedMidStream.countDown()
    }
    writer.join()
    assert(writerErr.get() == null, String.valueOf(writerErr.get()))
    assert(committed.get() == nCommits)
    assert(syncs >= 1, s"no sync overlapped the writer")

    // the catch-up sync lands every commit the writer made
    val fin = controller.sync(dsrc,
      Seq(new graft.formats.iceberg.IcebergConversionTarget(spark, iceTable)))
    assert(fin.forall(_.status == "SUCCESS"), fin.mkString(";"))
    val ice = new graft.formats.iceberg.IcebergConversionSource(
      spark, iceTable, "region")
    assert(ice.currentSnapshot().files.count() == 1 + nCommits)
    assert(ice.toDataFrame.count() == rowsPerFile * (1 + nCommits))
    // and a further re-sync is an idempotent no-op on the live set
    assert(controller.sync(dsrc,
      Seq(new graft.formats.iceberg.IcebergConversionTarget(spark, iceTable)))
      .forall(_.status == "SUCCESS"))
    assert(ice.currentSnapshot().files.count() == 1 + nCommits)
  }

  test("empty parquet source fails with a clear message") {
    val empty = tmpDir("empty_src")
    val e = intercept[IllegalStateException](
      new ParquetDirectorySource(spark, empty, "empty").currentSnapshot())
    assert(e.getMessage.contains("no parquet/orc/avro data files"))
  }

  test("racing DataFrame writers: every committed version has one author") {
    import graft.formats.delta._
    import org.apache.spark.sql.functions._
    val t = tmpDir("race_writer")
    val rows = spark.read.parquet(sf("sf0.001/region.parquet"))
    rows.write.format("graft").save(t)   // version 0 exists before racing

    // two threads append concurrently with retry-on-CAS-loss: no write
    // may be lost and no version double-committed
    val attemptsPerThread = 4
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val done = new java.util.concurrent.CountDownLatch(2)
    (1 to 2).foreach { tid =>
      pool.submit(new Runnable {
        def run(): Unit = try {
          var landed = 0
          while (landed < attemptsPerThread) {
            try {
              rows.withColumn("r_regionkey",
                  col("r_regionkey") + lit(tid * 100))
                .write.format("graft").mode("append").save(t)
              landed += 1
            } catch {
              case e: IllegalStateException
                if e.getMessage.contains("concurrent writer") => ()
            }
          }
        } catch { case th: Throwable => failures.add(th) }
        finally done.countDown()
      })
    }
    assert(done.await(300, java.util.concurrent.TimeUnit.SECONDS))
    pool.shutdown()
    assert(failures.isEmpty, failures.toString)
    // 1 create + 8 appends, versions contiguous, total rows exact
    val versions = DeltaLog.listVersions(t,
      graft.util.HadoopConfs.session(spark))
    assert(versions == (0L to 8L), versions.toString)
    assert(new DeltaConversionSource(spark, t, "region").toDataFrame
      .count() == 9 * rows.count())
  }

  /** region split into two files by key range, so predicates on disjoint
    * ranges mask disjoint files.
    */
  private def twoFileDelta(prefix: String): String = {
    import java.nio.file.{Files, Paths}
    val stage = tmpDir(s"${prefix}_stage")
    val df = spark.read.parquet(sf("sf0.001/region.parquet"))
    Seq(("lo", df.where("r_regionkey <= 2")), ("hi", df.where("r_regionkey >= 3")))
      .foreach { case (name, part) =>
        val tmp = tmpDir(s"${prefix}_$name")
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        val f = new java.io.File(tmp).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        Files.move(f.toPath, Paths.get(stage, s"$name.parquet"))
      }
    val target = tmpDir(s"${prefix}_delta")
    val src = new ParquetDirectorySource(spark, stage, "region")
    val out = TableFormatSync.syncSnapshot(
      Seq(new DeltaConversionTarget(spark, target)),
      src.currentSnapshot(), src.sourceFormat)
    assert(out.forall(_.status == "SUCCESS"), out.mkString(";"))
    target
  }

  test("conflict retry: disjoint intervening commit re-lands, overlap fails") {
    import org.apache.spark.sql.functions.col
    val t = twoFileDelta("retry_delta")
    val head = DeltaLog.latestVersion(t,
      graft.util.HadoopConfs.session(spark)).get
    // an "intervening" writer takes the next version touching hi.parquet
    assert(DeltaLog.writeCommit(t, head + 1, Iterator(
      """{"commitInfo":{"operation":"X"}}""",
      """{"remove":{"path":"hi.parquet","deletionTimestamp":1,"dataChange":true}}""")))
    // a commit planned at the old head touching lo.parquet only: disjoint
    // file sets → retries and lands at head+2
    val landed = DeltaConflicts.commitWithRetry(spark, t, head + 1, Iterator(
      """{"commitInfo":{"operation":"Y"}}""",
      """{"remove":{"path":"lo.parquet","deletionTimestamp":2,"dataChange":true}}"""))
    assert(landed == head + 2, s"landed $landed")
    // overlap: another stale commit touching lo.parquet (just re-landed
    // at head+2 by Y) must fail loudly
    val e = intercept[IllegalStateException] {
      DeltaConflicts.commitWithRetry(spark, t, head + 2, Iterator(
        """{"commitInfo":{"operation":"Z"}}""",
        """{"add":{"path":"lo.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}"""))
    }
    assert(e.getMessage.contains("conflict"), e.getMessage)
    // metadata change in the intervening commit also blocks a retry
    val head2 = DeltaLog.latestVersion(t,
      graft.util.HadoopConfs.session(spark)).get
    assert(DeltaLog.writeCommit(t, head2 + 1, Iterator(
      """{"metaData":{"id":"m2","format":{"provider":"parquet","options":{}},"schemaString":"{\"type\":\"struct\",\"fields\":[]}","partitionColumns":[],"configuration":{},"createdTime":1}}""")))
    val e2 = intercept[IllegalStateException] {
      DeltaConflicts.commitWithRetry(spark, t, head2 + 1, Iterator(
        """{"commitInfo":{"operation":"W"}}""",
        """{"remove":{"path":"nonexistent.parquet","deletionTimestamp":3,"dataChange":true}}"""))
    }
    assert(e2.getMessage.contains("metadata"), e2.getMessage)
  }

  test("two disjoint deleteWhere commits race: BOTH land") {
    import org.apache.spark.sql.functions.col
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val t = twoFileDelta("ddrace")
    val total = spark.read.parquet(sf("sf0.001/region.parquet")).count()
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val preds = Seq(col("r_regionkey") === 0, col("r_regionkey") === 4)
    preds.foreach { p =>
      pool.execute { () =>
        start.await()
        try assert(DeltaDeletes.deleteWhere(spark, t, p) == 1L)
        catch { case th: Throwable => failures.add(th) }
      }
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    assert(failures.isEmpty, failures.toString)
    val back = new DeltaConversionSource(spark, t, "region").toDataFrame
    assert(back.count() == total - 2)
    assert(back.select("r_regionkey").collect()
      .map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3))
  }

  test("iceberg: concurrent disjoint data appends both land via retry") {
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val target = tmpDir("iceracetgt")
    val src = new ParquetDirectorySource(spark,
      sf("sf0.001/region.parquet"), "region")
    val out = TableFormatSync.syncSnapshot(
      Seq(new graft.formats.iceberg.IcebergConversionTarget(spark, target)),
      src.currentSnapshot(), src.sourceFormat)
    assert(out.forall(_.status == "SUCCESS"), out.mkString(";"))
    val rows = spark.read.parquet(sf("sf0.001/region.parquet"))
    val dirs = Seq("a", "b").map { n =>
      val d = tmpDir(s"icerace_$n")
      rows.coalesce(1).write.mode("overwrite").parquet(d)
      d
    }
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    dirs.foreach { d =>
      pool.execute { () =>
        start.await()
        try graft.formats.iceberg.IcebergDeletes.appendDataFiles(spark, target, d)
        catch { case th: Throwable => failures.add(th) }
      }
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    assert(failures.isEmpty, failures.toString)
    assert(new graft.formats.iceberg.IcebergConversionSource(
      spark, target, "region").toDataFrame.count() == 3 * rows.count())
  }

  test("iceberg: append races a REPLACE compaction, both land") {
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val target = tmpDir("icereplace_race")
    val src = new ParquetDirectorySource(spark,
      sf("sf0.001/region.parquet"), "region")
    val out = TableFormatSync.syncSnapshot(
      Seq(new graft.formats.iceberg.IcebergConversionTarget(spark, target)),
      src.currentSnapshot(), src.sourceFormat)
    assert(out.forall(_.status == "SUCCESS"), out.mkString(";"))
    val rows = spark.read.parquet(sf("sf0.001/region.parquet"))
    val extra = tmpDir("icereplace_extra")
    rows.coalesce(1).write.mode("overwrite").parquet(extra)

    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    // thread 1: clustered REPLACE rewrite; thread 2: blind data append.
    // whichever loses the CAS must re-land (sequence-aware retry: the
    // replace carries the appended manifest forward; the blind append
    // commutes with the replace) — neither may fail, no row may vanish
    pool.execute { () =>
      start.await()
      try graft.formats.iceberg.IcebergDeletes.rewriteWithDeletes(
        spark, target, zorderBy = Seq("r_regionkey"))
      catch { case th: Throwable => failures.add(th) }
    }
    pool.execute { () =>
      start.await()
      try graft.formats.iceberg.IcebergDeletes.appendDataFiles(
        spark, target, extra)
      catch { case th: Throwable => failures.add(th) }
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    assert(failures.isEmpty, failures.toString)
    assert(new graft.formats.iceberg.IcebergConversionSource(
      spark, target, "region").toDataFrame.count() == 2 * rows.count())
  }

  test("delete re-land past a concurrent append: Serializable predicate check") {
    import org.apache.spark.sql.functions.col
    // delta-spark's ConcurrentAppendException semantics: a deleteWhere
    // losing its CAS to an APPEND may re-land only when the appended
    // file's stats PROVE the delete predicate misses it; an append whose
    // rows may match must fail the retry (else those rows silently
    // escape the delete)
    val t = twoFileDelta("serializable_delta")
    val conf = graft.util.HadoopConfs.session(spark)

    // footprint of `r_regionkey = 0`
    val fp = DeltaConflicts.footprintOf(spark,
      spark.read.parquet(sf("sf0.001/region.parquet")).schema,
      col("r_regionkey") === 0)
    assert(fp.skipping.isDefined)

    def addLine(path: String, mn: Int, mx: Int): String =
      s"""{"add":{"path":"$path","partitionValues":{},"size":10,""" +
        s""""modificationTime":1,"dataChange":true,""" +
        s""""stats":"{\\"numRecords\\":2,\\"minValues\\":{\\"r_regionkey\\":$mn},""" +
        s"""\\"maxValues\\":{\\"r_regionkey\\":$mx}}"}}"""

    // intervening append provably OUTSIDE the predicate (keys 7..9): the
    // delete-shaped commit re-lands
    val head = DeltaLog.latestVersion(t, conf).get
    assert(DeltaLog.writeCommit(t, head + 1,
      Iterator("""{"commitInfo":{"operation":"WRITE"}}""",
        addLine("fresh_hi.parquet", 7, 9))))
    val landed = DeltaConflicts.commitWithRetry(spark, t, head + 1, Iterator(
      """{"commitInfo":{"operation":"DELETE"}}""",
      """{"remove":{"path":"lo.parquet","deletionTimestamp":2,"dataChange":true}}"""),
      read = Some(fp))
    assert(landed == head + 2, s"landed $landed")

    // intervening append whose range COVERS key 0: the retry must fail
    val head2 = DeltaLog.latestVersion(t, conf).get
    assert(DeltaLog.writeCommit(t, head2 + 1,
      Iterator("""{"commitInfo":{"operation":"WRITE"}}""",
        addLine("fresh_lo.parquet", 0, 1))))
    val e = intercept[IllegalStateException] {
      DeltaConflicts.commitWithRetry(spark, t, head2 + 1, Iterator(
        """{"commitInfo":{"operation":"DELETE"}}""",
        """{"remove":{"path":"hi.parquet","deletionTimestamp":3,"dataChange":true}}"""),
        read = Some(fp))
    }
    assert(e.getMessage.contains("predicate"), e.getMessage)

    // an append with NO stats is indistinguishable from a match: conflict
    val head3 = DeltaLog.latestVersion(t, conf).get
    assert(DeltaLog.writeCommit(t, head3 + 1,
      Iterator("""{"commitInfo":{"operation":"WRITE"}}""",
        """{"add":{"path":"fresh_nostats.parquet","partitionValues":{},"size":10,"modificationTime":1,"dataChange":true}}""")))
    val e2 = intercept[IllegalStateException] {
      DeltaConflicts.commitWithRetry(spark, t, head3 + 1, Iterator(
        """{"commitInfo":{"operation":"DELETE"}}""",
        """{"remove":{"path":"nonexistent.parquet","deletionTimestamp":4,"dataChange":true}}"""),
        read = Some(fp))
    }
    assert(e2.getMessage.contains("predicate"), e2.getMessage)
  }

  test("iceberg stream sink: replayed batch skips even through the retry path") {
    import org.apache.spark.sql.functions.lit
    val target = tmpDir("icestream_replay")
    val src = new ParquetDirectorySource(spark,
      sf("sf0.001/region.parquet"), "region")
    val out = TableFormatSync.syncSnapshot(
      Seq(new graft.formats.iceberg.IcebergConversionTarget(spark, target)),
      src.currentSnapshot(), src.sourceFormat)
    assert(out.forall(_.status == "SUCCESS"), out.mkString(";"))
    val rows = spark.read.parquet(sf("sf0.001/region.parquet"))
    val base = new graft.formats.iceberg.IcebergConversionSource(
      spark, target, "region").toDataFrame.count()

    import graft.formats.iceberg.IcebergStreamSink
    assert(IcebergStreamSink.appendBatch(spark, target, rows, "appA", 0L))
    // plain replay of the same batch id: skipped
    assert(!IcebergStreamSink.appendBatch(spark, target, rows, "appA", 0L))
    // zombie-replay shape: the stamp for batch 1 lands via a CONCURRENT
    // commit after this attempt's first metadata read — appendCommit's
    // txnGuard recheck must abort the re-land instead of duplicating.
    // Direct form: stamp batch 1, then drive appendCommit with an
    // expectVersion that forces the retry path while the stamp is newer.
    assert(IcebergStreamSink.appendBatch(spark, target, rows, "appA", 1L))
    assert(!IcebergStreamSink.appendBatch(spark, target, rows, "appA", 1L))
    val got = new graft.formats.iceberg.IcebergConversionSource(
      spark, target, "region").toDataFrame.count()
    assert(got == base + 2 * rows.count(), s"got $got")
    assert(IcebergStreamSink.lastTxnVersion(spark, target, "appA")
      .contains(1L))
  }

  test("stream-sink batch races a batch append on iceberg: both land, " +
    "txn recorded") {
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    import spark.implicits._
    val target = tmpDir("gsk_race")
    (0L until 40L).map(i => (i, s"v$i")).toDF("id", "name")
      .write.format("graft").option("tableFormat", "iceberg")
      .mode("append").save(target)
    val streamRows = (100L until 140L).map(i => (i, s"v$i"))
      .toDF("id", "name")
    val batchRows = (200L until 240L).map(i => (i, s"v$i"))
      .toDF("id", "name")
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    pool.execute { () =>
      start.await()
      try graft.formats.iceberg.IcebergStreamSink.appendBatch(
        spark, target, streamRows, "gsk_race_app", 0L)
      catch { case th: Throwable => failures.add(th) }
    }
    pool.execute { () =>
      start.await()
      try batchRows.write.format("graft").option("tableFormat", "iceberg")
        .mode("append").save(target)
      catch { case th: Throwable => failures.add(th) }
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    assert(failures.isEmpty, failures.toString)
    assert(spark.read.format("graft").load(target).count() == 120)
    assert(graft.formats.iceberg.IcebergStreamSink
      .lastTxnVersion(spark, target, "gsk_race_app").contains(0L))
    // and the replay of the landed stream batch is still a no-op
    assert(!graft.formats.iceberg.IcebergStreamSink.appendBatch(
      spark, target, streamRows, "gsk_race_app", 0L))
    assert(spark.read.format("graft").load(target).count() == 120)
  }

  test("racing batch writers (tableFormat=iceberg): both appends land") {
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val target = tmpDir("gbw_race")
    val base = (0L until 50L).map(i => (i, s"v$i")).toDF("id", "name")
    base.write.format("graft").option("tableFormat", "iceberg")
      .mode("append").save(target)
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    Seq(100L, 200L).foreach { off =>
      val rows = (off until off + 50L).map(i => (i, s"v$i"))
        .toDF("id", "name")
      pool.execute { () =>
        start.await()
        try rows.write.format("graft").option("tableFormat", "iceberg")
          .mode("append").save(target)
        catch { case th: Throwable => failures.add(th) }
      }
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    assert(failures.isEmpty, failures.toString)
    val df = spark.read.format("graft").load(target)
    assert(df.count() == 150, s"got ${df.count()}")
    assert(df.filter(col("id") >= 100L && col("id") < 150L).count() == 50)
    assert(df.filter(col("id") >= 200L).count() == 50)
  }
  test("expectBaseCommit: a pinned full-set sync loses loudly to a " +
    "concurrent commit; the concurrent rows survive") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    for (fmt <- Seq("iceberg", "hudi", "paimon")) {
      val data = tmpDir(s"eb_${fmt}_data")
      (0L until 40L).map(i => (i, s"v$i")).toDF("id", "name")
        .repartition(2).write.mode("overwrite").parquet(data)
      val t = tmpDir(s"eb_$fmt")
      def target(): graft.spi.ConversionTarget = fmt match {
        case "iceberg" =>
          new graft.formats.iceberg.IcebergConversionTarget(spark, t)
        case "hudi" => new graft.formats.hudi.HudiConversionTarget(spark, t)
        case "paimon" =>
          new graft.formats.paimon.PaimonConversionTarget(spark, t)
      }
      val src0 = new ParquetDirectorySource(spark, data, "t")
      val out0 = TableFormatSync.syncSnapshot(Seq(target()),
        src0.currentSnapshot(), src0.sourceFormat)
      require(out0.forall(_.status == "SUCCESS"), out0.mkString(";"))

      // a maintenance job (compaction / clustering / ALTER) plans its
      // file set against this snapshot...
      val planSrc = graft.sources.CatalogConversionSource
        .fromPath(spark, t, "t")
      val planning = planSrc.currentSnapshot()
      // ...then a concurrent append advances the table
      (100L until 120L).map(i => (i, s"v$i")).toDF("id", "name")
        .write.format("graft").option("tableFormat", fmt)
        .mode("append").save(t)

      // the pinned commit must fail loudly — a silent rebase would diff
      // the concurrent append away as removes (row loss)
      val out = TableFormatSync.syncSnapshot(Seq(target()), planning,
        planSrc.sourceFormat, expectBase = Some(planning.commitId))
      assert(out.exists(o => o.status == "ERROR" &&
        o.error.exists(_.contains("concurrent writer advanced"))),
        s"$fmt: $out")
      val df = spark.read.format("graft").load(t)
      assert(df.count() == 60, s"$fmt: concurrent rows must survive")
      assert(df.filter(col("id") >= 100L).count() == 20, fmt)

      // re-planned against the new head, the same pinned sync goes through
      val fresh = graft.sources.CatalogConversionSource
        .fromPath(spark, t, "t").currentSnapshot()
      val out2 = TableFormatSync.syncSnapshot(Seq(target()), fresh,
        planSrc.sourceFormat, expectBase = Some(fresh.commitId))
      assert(out2.forall(_.status == "SUCCESS"), s"$fmt: $out2")
    }
  }

  test("hudi expectBaseCommit: pinned commits take the deterministic " +
    "successor instant, so the check-then-write window arbitrates at " +
    "the instant file, not the head probe") {
    import spark.implicits._
    val data = tmpDir("ebd_hudi_data")
    (0L until 30L).map(i => (i, s"v$i")).toDF("id", "name")
      .repartition(2).write.mode("overwrite").parquet(data)
    val t = tmpDir("ebd_hudi")
    val src = new ParquetDirectorySource(spark, data, "t")
    val out0 = TableFormatSync.syncSnapshot(
      Seq(new graft.formats.hudi.HudiConversionTarget(spark, t)),
      src.currentSnapshot(), src.sourceFormat)
    require(out0.forall(_.status == "SUCCESS"), out0.mkString(";"))
    val base = graft.formats.hudi.HudiTimeline.listInstants(t).last

    // a pinned sync commits at EXACTLY base+1 — two pinned writers that
    // both pass the head re-check inside the check-then-write window
    // therefore race on the same instant filename, and the completed
    // file's create-exclusive publish fails the loser loudly
    val planSrc = graft.sources.CatalogConversionSource.fromPath(spark, t, "t")
    val planning = planSrc.currentSnapshot()
    val out1 = TableFormatSync.syncSnapshot(
      Seq(new graft.formats.hudi.HudiConversionTarget(spark, t)),
      planning, planSrc.sourceFormat, expectBase = Some(base))
    assert(out1.forall(_.status == "SUCCESS"), out1.mkString(";"))
    val head = graft.formats.hudi.HudiTimeline.listInstants(t).last
    assert(head == (BigInt(base) + 1).toString,
      s"pinned commit landed at $head, expected successor of $base")

    // the loser's publish: same successor instant, create-exclusive
    val dup = graft.formats.hudi.HudiTimeline.writeCommitStreamed(
      t, head, "commit", Iterator.empty, Iterator.empty, Map.empty)
    assert(!dup, "second writer on the pinned successor must lose")
  }
}
