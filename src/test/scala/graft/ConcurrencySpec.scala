package graft

import graft.formats.delta._
import graft.model._
import graft.sources.ParquetDirectorySource
import graft.sync.TableFormatSync

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

  test("empty parquet source fails with a clear message") {
    val empty = tmpDir("empty_src")
    val e = intercept[IllegalStateException](
      new ParquetDirectorySource(spark, empty, "empty").currentSnapshot())
    assert(e.getMessage.contains("no parquet data files"))
  }
}
