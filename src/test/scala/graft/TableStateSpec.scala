package graft

import org.apache.spark.sql.functions._

import graft.formats.delta._
import graft.formats.iceberg._
import graft.sources.ParquetDirectorySource
import graft.sync.TableFormatSync

/** Table state management: Delta RESTORE, Iceberg ROLLBACK and snapshot
  * refs (branches/tags) — the edges the driver gates don't cover.
  */
class TableStateSpec extends SparkSuite {

  private def deltaTable(prefix: String): String = {
    val dataDir = tmpDir(s"${prefix}_data")
    spark.read.parquet(sf("sf0.001") + "/nation.parquet").repartition(2)
      .write.mode("overwrite").parquet(dataDir)
    val t = tmpDir(s"${prefix}_delta")
    val src = new ParquetDirectorySource(spark, dataDir, "nation")
    val out = TableFormatSync.syncSnapshot(
      Seq(new DeltaConversionTarget(spark, t)), src.currentSnapshot(),
      src.sourceFormat)
    assert(out.forall(_.status == "SUCCESS"), out.mkString(";"))
    t
  }

  private def icebergTable(prefix: String): String = {
    val dataDir = tmpDir(s"${prefix}_data")
    spark.read.parquet(sf("sf0.001") + "/nation.parquet").repartition(2)
      .write.mode("overwrite").parquet(dataDir)
    val t = tmpDir(s"${prefix}_ice")
    val src = new ParquetDirectorySource(spark, dataDir, "nation")
    val out = TableFormatSync.syncSnapshot(
      Seq(new IcebergConversionTarget(spark, t)), src.currentSnapshot(),
      src.sourceFormat)
    assert(out.forall(_.status == "SUCCESS"), out.mkString(";"))
    t
  }

  test("delta restore refuses when target files no longer exist") {
    val t = deltaTable("restore_vac")
    assert(DeltaDeletes.deleteWhere(spark, t,
      col("n_nationkey") % 2 === 0) > 0)
    // compaction folds the DV'd files into fresh in-table files; the
    // originals (a synced table references them in the SOURCE dir) are
    // then retired out-of-band — a restore to v0 must refuse, not author
    // adds that can never be read
    assert(DeltaOptimize.compact(spark, t).rewrote > 0)
    val v0Files = new DeltaConversionSource(spark, t, "nation")
      .snapshotAt(0L).files.collect()
    v0Files.foreach(f =>
      assert(new java.io.File(new java.net.URI("file://" + f.path)).delete()))
    val e = intercept[IllegalArgumentException] {
      DeltaRestore.restoreTo(spark, t, 0L)
    }
    assert(e.getMessage.contains("no longer exist"))
    // and the head still reads consistently after the refusal
    val n = new DeltaConversionSource(spark, t, "nation").toDataFrame.count()
    assert(n == spark.read.parquet(sf("sf0.001") + "/nation.parquet")
      .filter(col("n_nationkey") % 2 =!= 0).count())
  }

  test("delta restore reverts a schema change with the file set") {
    val t = deltaTable("restore_meta")
    DeltaChanges.enableChangeDataFeed(spark, t)   // metaData-only commit
    assert(DeltaDeletes.deleteWhere(spark, t, col("n_nationkey") === 0) > 0)
    val res = DeltaRestore.restoreTo(spark, t, 0L)
    assert(res.readded >= 1)
    val src = new DeltaConversionSource(spark, t, "nation")
    // restored metaData: the CDF property from version 1 is gone again
    val vs = DeltaLog.listVersions(t, graft.util.HadoopConfs.session(spark))
    assert(!DeltaSnapshot.metadata(spark, t, vs)
      .exists(DeltaChanges.isEnabled))
    assert(src.toDataFrame.count() ==
      spark.read.parquet(sf("sf0.001") + "/nation.parquet").count())
  }

  test("iceberg tags are immutable, branches move, drops are clean") {
    val t = icebergTable("refs")
    IcebergRefs.createTag(spark, t, "t1")
    IcebergRefs.createBranch(spark, t, "b1")
    val e = intercept[IllegalArgumentException] {
      IcebergRefs.createTag(spark, t, "t1")
    }
    assert(e.getMessage.contains("immutable"))
    // append a second snapshot, move the branch to it
    val more = spark.read.parquet(sf("sf0.001") + "/nation.parquet")
      .withColumn("n_nationkey", col("n_nationkey") + 100)
    val dir = s"$t/data/extra-${java.util.UUID.randomUUID()}"
    more.write.parquet(dir)
    IcebergDeletes.appendDataFiles(spark, t, dir)
    IcebergRefs.createBranch(spark, t, "b1")      // re-point at new head
    val m = IcebergMetadata.read(t, IcebergMetadata.currentVersion(t).get)
    assert(IcebergRefs.resolve(m, "t1") == 1L)
    assert(IcebergRefs.resolve(m, "b1") == 2L)
    assert(IcebergRefs.resolve(m, "main") == 2L)
    IcebergRefs.dropRef(spark, t, "t1")
    val m2 = IcebergMetadata.read(t, IcebergMetadata.currentVersion(t).get)
    assert(m2.refs.keySet == Set("b1"))
  }

  test("iceberg delete-aware time travel reads a delete-carrying seq") {
    val t = icebergTable("tt_deletes")
    assert(IcebergDeletes.updateWhere(spark, t,
      col("n_nationkey") === 0, Map("n_regionkey" -> lit(77))) > 0)
    val src = new IcebergConversionSource(spark, t, "nation")
    // seq 2 carries equality deletes: file-level snapshotAt refuses,
    // the delete-aware historical read serves the updated rows
    intercept[graft.model.DeletionVectorsUnsupported] {
      src.snapshotAt(2L).files.count()
    }
    val at2 = src.toDataFrameAt(2L)
    assert(at2.filter(col("n_regionkey") === 77).count() == 1)
    // and seq 1 still serves the original state
    assert(src.toDataFrameAt(1L)
      .filter(col("n_regionkey") === 77).count() == 0)
  }

  test("iceberg rollback: fresh sequences after, refs survive") {
    val t = icebergTable("rollback")
    IcebergRefs.createTag(spark, t, "keep")
    assert(IcebergDeletes.updateWhere(spark, t,
      col("n_nationkey") === 0, Map("n_regionkey" -> lit(99))) > 0)
    IcebergRefs.rollbackTo(spark, t, 1L)
    val m = IcebergMetadata.read(t, IcebergMetadata.currentVersion(t).get)
    assert(m.headSequence == 1L && m.lastSequenceNumber == 2L)
    assert(m.refs.contains("keep"))
    // a commit after the rollback continues the sequence (3), and reads
    // see base state + the new rows — never the rolled-back update
    val more = spark.read.parquet(sf("sf0.001") + "/nation.parquet")
      .withColumn("n_nationkey", col("n_nationkey") + 100)
    val dir = s"$t/data/extra-${java.util.UUID.randomUUID()}"
    more.write.parquet(dir)
    IcebergDeletes.appendDataFiles(spark, t, dir)
    val m3 = IcebergMetadata.read(t, IcebergMetadata.currentVersion(t).get)
    assert(m3.headSequence == 3L)
    val df = new IcebergConversionSource(spark, t, "nation").toDataFrame
    assert(df.count() == 2 *
      spark.read.parquet(sf("sf0.001") + "/nation.parquet").count())
    assert(df.filter(col("n_regionkey") === 99).count() == 0)
  }
}
