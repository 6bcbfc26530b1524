package graft

import org.apache.spark.sql.functions._

import graft.formats.delta.{DeltaConversionSource, DeltaConversionTarget,
  DeltaDeletes, DeltaOptimize, DeltaVacuum}
import graft.sources.ParquetDirectorySource
import graft.sync.TableFormatSync

/** VACUUM: physically deletes exactly the unreferenced-and-expired files,
  * never a live one; retention keeps time travel alive; after a
  * zero-retention vacuum, vacuumed-version reads fail loudly.
  */
class DeltaVacuumSpec extends SparkSuite {

  private def freshTable(prefix: String): String = {
    val dataDir = tmpDir(prefix + "_data")
    spark.read.parquet(sf("sf0.001") + "/customer.parquet")
      .repartition(4).write.mode("overwrite").parquet(dataDir)
    val target = tmpDir(prefix + "_delta")
    val src = new ParquetDirectorySource(spark, dataDir, "customer")
    val out = TableFormatSync.syncSnapshot(
      Seq(new DeltaConversionTarget(spark, target)),
      src.currentSnapshot(), src.sourceFormat)
    assert(out.forall(_.status == "SUCCESS"), out.mkString(";"))
    target
  }

  /** Vacuum-visible files: skip the log and hidden sidecars (.crc). */
  private def filesUnder(dir: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    def walk(f: java.io.File): Unit =
      if (f.isDirectory) {
        if (f.getName != "_delta_log" && !f.getName.startsWith("."))
          f.listFiles().foreach(walk)
      } else if (!f.getName.startsWith("."))
        out += f.getPath
    walk(new java.io.File(dir))
    out.result()
  }

  test("vacuum(0) sweeps superseded data and DV files, reads unharmed") {
    val table = freshTable("vac")
    assert(DeltaDeletes.deleteWhere(spark, table, col("c_acctbal") < 0) > 0)
    // compact absorbs the DVs into in-table rewritten files (the synced
    // ORIGINAL data files live in the source dir — outside the table, so
    // outside vacuum's reach, exactly like Delta's own VACUUM)
    val res0 = DeltaOptimize.compact(spark, table)
    assert(res0.rewrote == 4)
    // second full rewrite: the first rewrite's files are now superseded
    // IN-table data files
    val res1 = DeltaOptimize.zorderBy(spark, table, Seq("c_custkey"))
    assert(res1.rewrote == res0.wrote)
    def src() = new DeltaConversionSource(spark, table, "customer")
    val want = src().toDataFrame.select("c_custkey")
      .collect().map(_.getLong(0)).sorted.toSeq

    val before = filesUnder(table)
    assert(before.exists(_.endsWith(".bin")), "expected DV files on disk")
    val res = DeltaVacuum.vacuum(spark, table, retentionMillis = 0L)
    // superseded: the compaction's data files + >=1 DV file
    assert(res.deleted >= res0.wrote + 1, res.toString)
    val after = filesUnder(table)
    assert(!after.exists(_.endsWith(".bin")),
      "zero-retention vacuum must sweep superseded DV files")
    assert(after.size == before.size - res.deleted)

    val got = src().toDataFrame.select("c_custkey")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want, "vacuum deleted a referenced file")

    // time travel to the post-compaction version (whose in-table files
    // were just swept) now fails LOUDLY
    val e = intercept[Exception] {
      graft.formats.delta.DeltaRead.toDataFrame(spark,
        src().snapshotAt(2L)).count()
    }
    assert(e.getMessage != null)
  }

  test("a long retention keeps every file and time travel works") {
    val table = freshTable("vac_keep")
    assert(DeltaDeletes.deleteWhere(spark, table, col("c_acctbal") < 0) > 0)
    val v0Count = graft.formats.delta.DeltaRead.toDataFrame(spark,
      new DeltaConversionSource(spark, table, "customer").snapshotAt(0L))
      .count()
    val before = filesUnder(table).toSet
    val res = DeltaVacuum.vacuum(spark, table,
      retentionMillis = 7L * 24 * 3600 * 1000)
    assert(res.deleted == 0L, res.toString)
    assert(filesUnder(table).toSet == before)
    // pre-delete version still readable (retention window honored)
    val again = graft.formats.delta.DeltaRead.toDataFrame(spark,
      new DeltaConversionSource(spark, table, "customer").snapshotAt(0L))
      .count()
    assert(again == v0Count)
  }
  test("in-place multi-format table: each plane's sweep never touches a " +
    "sibling plane") {
    // the engine's core conversion mode: delta + iceberg + paimon
    // metadata planes over ONE directory of shared parquet files
    val base = tmpDir("vac_inplace")
    spark.read.parquet(sf("sf0.001") + "/region.parquet")
      .repartition(2).write.mode("append").parquet(base)
    val src = new ParquetDirectorySource(spark, base, "region")
    val out = TableFormatSync.syncSnapshot(Seq(
      new DeltaConversionTarget(spark, base),
      new graft.formats.iceberg.IcebergConversionTarget(spark, base),
      new graft.formats.paimon.PaimonConversionTarget(spark, base)),
      src.currentSnapshot(), src.sourceFormat)
    assert(out.forall(_.status == "SUCCESS"), out.mkString(";"))

    def readAll(): Seq[Long] = Seq(
      new DeltaConversionSource(spark, base, "region")
        .toDataFrame.count(),
      new graft.formats.iceberg.IcebergConversionSource(spark, base,
        "region").toDataFrame.count(),
      new graft.formats.paimon.PaimonConversionSource(spark, base,
        "region").toDataFrame.count())
    val before = readAll()
    assert(before.distinct.size == 1 && before.head == 5, before.toString)

    // every plane's zero-retention sweep runs; all three planes must
    // keep serving afterwards — a sweep that walked a sibling plane
    // would have deleted its (keep-set-invisible) metadata files
    DeltaVacuum.vacuum(spark, base, retentionMillis = 0L)
    graft.formats.iceberg.IcebergMaintenance
      .removeOrphanFiles(spark, base, retentionMillis = 0L)
    graft.formats.paimon.PaimonMaintenance
      .removeOrphanFiles(spark, base, retentionMillis = 0L)
    assert(readAll() == before,
      "a retention sweep destroyed a sibling format's metadata plane")
  }
}
