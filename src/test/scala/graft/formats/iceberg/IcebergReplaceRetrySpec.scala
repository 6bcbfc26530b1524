package graft.formats.iceberg

import graft.SparkSuite
import graft.sources.ParquetDirectorySource
import graft.sync.TableFormatSync

/** Deterministic coverage of the sequence-aware REPLACE retry (the race
  * in ConcurrencySpec exercises it stochastically): a REPLACE planned at
  * a stale version re-lands past an intervening pure data append and
  * CARRIES the appended manifest forward — no appended row may vanish —
  * while equality deletes stay strict past any intervening commit.
  */
class IcebergReplaceRetrySpec extends SparkSuite {

  private def icebergTable(prefix: String): String = {
    val target = tmpDir(prefix)
    val src = new ParquetDirectorySource(spark,
      sf("sf0.001/region.parquet"), "region")
    val out = TableFormatSync.syncSnapshot(
      Seq(new IcebergConversionTarget(spark, target)),
      src.currentSnapshot(), src.sourceFormat)
    assert(out.forall(_.status == "SUCCESS"), out.mkString(";"))
    target
  }

  test("stale REPLACE re-lands past a pure append, carrying its manifest") {
    val t = icebergTable("ice_replace_stale")
    val rows = spark.read.parquet(sf("sf0.001/region.parquet"))
    val planned = IcebergMetadata.currentVersion(t).get

    // the rewrite's output, staged from the PLANNED state (head of v1)
    val rewritten = s"$t/data/rewrite-test"
    new IcebergConversionSource(spark, t, "region").toDataFrame
      .write.parquet(rewritten)

    // an append lands AFTER the replace planned (moves the head)
    val extra = tmpDir("ice_replace_extra")
    rows.coalesce(1).write.mode("overwrite").parquet(extra)
    IcebergDeletes.appendDataFiles(spark, t, extra)
    assert(IcebergMetadata.currentVersion(t).get > planned)

    // the stale replace must re-land, not fail — and the appended rows
    // must survive via the carried-forward manifest
    IcebergDeletes.appendCommit(spark, t, rows = null, content = 0,
      equalityIds = Nil, dataDir = Some(rewritten), replace = true,
      expectVersion = Some(planned))
    val got = new IcebergConversionSource(spark, t, "region")
      .toDataFrame.count()
    assert(got == 2 * rows.count(), s"got $got")
    val m = IcebergMetadata.read(t, IcebergMetadata.currentVersion(t).get)
    assert(m.currentSnapshot.exists(_.operation == "replace"))
  }

  test("stale blind append re-lands past a REPLACE (fast-append commutes)") {
    val t = icebergTable("ice_append_stale")
    val rows = spark.read.parquet(sf("sf0.001/region.parquet"))
    val planned = IcebergMetadata.currentVersion(t).get

    // the append's files, staged before the replace moves the head
    val extra = tmpDir("ice_append_stale_extra")
    rows.coalesce(1).write.mode("overwrite").parquet(extra)

    // a clustered REPLACE lands first
    assert(IcebergDeletes.rewriteWithDeletes(spark, t,
      zorderBy = Seq("r_regionkey")))
    assert(IcebergMetadata.currentVersion(t).get > planned)

    // the stale blind append must re-land on top of the replace: its
    // file is fresh, so it conflicts with nothing
    IcebergDeletes.appendCommit(spark, t, rows = null, content = 0,
      equalityIds = Nil, dataDir = Some(extra),
      expectVersion = Some(planned))
    assert(new IcebergConversionSource(spark, t, "region")
      .toDataFrame.count() == 2 * rows.count())
  }

  test("expiration retains ref-pinned and rolled-back-current snapshots") {
    val t = icebergTable("ice_expire_refs")
    val rows = spark.read.parquet(sf("sf0.001/region.parquet"))
    // three snapshots: sync (seq 1) + two appends
    (1 to 2).foreach { i =>
      val d = tmpDir(s"ice_expire_add_$i")
      rows.coalesce(1).write.mode("overwrite").parquet(d)
      IcebergDeletes.appendDataFiles(spark, t, d)
    }
    IcebergRefs.createTag(spark, t, "v1", atSeq = Some(1L))

    // retainLast=1 would drop seq 1 and 2 — but the tag pins seq 1
    val expired = IcebergMaintenance.expireSnapshots(t, retainLast = 1)
    assert(expired == Seq(2L), expired.toString)
    // the tag still serves the pinned state
    assert(spark.read.format("graft").option("branch", "v1").load(t)
      .count() == rows.count())

    // a rolled-back CURRENT older than the window survives too
    IcebergRefs.rollbackTo(spark, t, 1L)
    assert(IcebergMaintenance.expireSnapshots(t, retainLast = 1).isEmpty)
    assert(new IcebergConversionSource(spark, t, "region")
      .toDataFrame.count() == rows.count())
  }

  test("WAP: branch append leaves main untouched; fast-forward refuses divergence") {
    val t = icebergTable("ice_wap")
    val rows = spark.read.parquet(sf("sf0.001/region.parquet"))
    IcebergRefs.createBranch(spark, t, "audit")

    val staged = tmpDir("ice_wap_staged")
    rows.coalesce(1).write.mode("overwrite").parquet(staged)
    IcebergDeletes.appendDataFiles(spark, t, staged, toBranch = Some("audit"))

    // main untouched, branch carries the staged rows
    assert(new IcebergConversionSource(spark, t, "region")
      .toDataFrame.count() == rows.count())
    assert(spark.read.format("graft").option("branch", "audit").load(t)
      .count() == 2 * rows.count())

    // a DIVERGED main (its own append after the branch forked) must
    // refuse the fast-forward — forcing it would drop main's commit
    val mainExtra = tmpDir("ice_wap_main_extra")
    rows.coalesce(1).write.mode("overwrite").parquet(mainExtra)
    IcebergDeletes.appendDataFiles(spark, t, mainExtra)
    val e = intercept[IllegalArgumentException] {
      IcebergRefs.fastForward(spark, t, "audit")
    }
    assert(e.getMessage.contains("not a fast-forward"), e.getMessage)

    // roll main back to the fork point: the publish then lands
    IcebergRefs.rollbackTo(spark, t, 1L)
    IcebergRefs.fastForward(spark, t, "audit")
    assert(new IcebergConversionSource(spark, t, "region")
      .toDataFrame.count() == 2 * rows.count())
    // unknown branch / tag targets refuse
    intercept[IllegalArgumentException] {
      IcebergDeletes.appendDataFiles(spark, t, staged, toBranch = Some("nope"))
    }
  }

  test("stale eq-delete re-lands past a stats-provably-DISJOINT append") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val t = icebergTable("ice_eqdel_disjoint")
    val rows = spark.read.parquet(sf("sf0.001/region.parquet"))
    val planned = IcebergMetadata.currentVersion(t).get

    // intervening append whose keys (100..104) provably miss the delete
    // key (0): min/max disjoint on the equality column
    val extra = tmpDir("ice_eqdel_disjoint_extra")
    rows.withColumn("r_regionkey", col("r_regionkey") + 100)
      .coalesce(1).write.mode("overwrite").parquet(extra)
    IcebergDeletes.appendDataFiles(spark, t, extra)

    // the stale eq-delete must re-land (disjointness proven from the
    // appended manifest's bounds), masking key 0 in the original file
    IcebergDeletes.appendCommit(spark, t,
      rows = Seq(0).toDF("r_regionkey"), content = 2,
      equalityIds = Seq(1), expectVersion = Some(planned))
    val back = new IcebergConversionSource(spark, t, "region").toDataFrame
    assert(back.count() == 2 * rows.count() - 1)
    assert(back.filter(col("r_regionkey") === 0).isEmpty)
    assert(back.filter(col("r_regionkey") === 100).count() == 1)
  }

  test("stale equality delete still fails loudly past an intervening commit") {
    import spark.implicits._
    val t = icebergTable("ice_eqdel_stale")
    val rows = spark.read.parquet(sf("sf0.001/region.parquet"))
    val planned = IcebergMetadata.currentVersion(t).get
    val extra = tmpDir("ice_eqdel_extra")
    rows.coalesce(1).write.mode("overwrite").parquet(extra)
    IcebergDeletes.appendDataFiles(spark, t, extra)

    val eqIds = IcebergMetadata.read(t,
      IcebergMetadata.currentVersion(t).get).schema.fields.toSeq
      .take(1).map(_ => 1)
    val e = intercept[IllegalStateException] {
      IcebergDeletes.appendCommit(spark, t,
        rows = Seq(0).toDF("r_regionkey"), content = 2,
        equalityIds = eqIds, expectVersion = Some(planned))
    }
    assert(e.getMessage.contains("conflict"), e.getMessage)
  }
}
