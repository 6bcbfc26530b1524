package graft

import org.apache.spark.sql.functions._

import graft.util.FaultInjection

/** Crash-consistency of the four destructive maintenance ops: the process
  * dies mid-physical-delete (injected via [[graft.util.FaultInjection]])
  * and the table must (1) never have lost a live file — the metadata
  * plane was tombstoned BEFORE any physical delete, so the current
  * snapshot still serves row-identically, (2) keep files outside the
  * table directory (adopted source data) untouched, and (3) converge on
  * re-run: already-deleted paths no-op, the remainder is swept, a third
  * run deletes nothing.
  */
class FaultInjectionSpec extends SparkSuite {

  private lazy val gs = graft.sql.GraftSql.session(spark)

  private def crashes(body: => Unit): Unit = {
    val e = intercept[Throwable](body)
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: chain(t.getCause)
    assert(chain(e).exists(m => m != null && m.contains("injected crash")),
      s"expected the injected crash, got: $e")
    FaultInjection.disarm()
  }

  private def fileCount(dir: String): Long = {
    val it = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
    try it.filter(java.nio.file.Files.isRegularFile(_)).count()
    finally it.close()
  }

  test("delta VACUUM killed mid-delete: log intact, table serves, " +
    "re-run converges") {
    import spark.implicits._
    val t = tmpDir("fi_delta")
    (0L until 400L).map(i => (i, s"v$i")).toDF("id", "name")
      .repartition(4).write.format("graft").mode("append").save(t)
    // compaction tombstones the 4 originals in the log FIRST — the
    // doomed set for vacuum
    graft.formats.delta.DeltaOptimize.compact(spark, t)
    val expect = spark.read.format("graft").load(t)
      .agg(count(lit(1)), sum("id")).head()

    FaultInjection.armDeleteCrash(after = 1)
    crashes {
      graft.formats.delta.DeltaVacuum.vacuum(spark, t, retentionMillis = 0L)
    }
    // killed after exactly one physical delete: the current snapshot
    // must still serve row-identically (its files were never doomed)
    assert(spark.read.format("graft").load(t)
      .agg(count(lit(1)), sum("id")).head() == expect,
      "crash mid-vacuum corrupted the serveable snapshot")

    val rerun = graft.formats.delta.DeltaVacuum
      .vacuum(spark, t, retentionMillis = 0L)
    assert(rerun.deleted >= 1, "re-run must sweep the remainder")
    assert(graft.formats.delta.DeltaVacuum
      .vacuum(spark, t, retentionMillis = 0L).deleted == 0L,
      "third run must find nothing")
    assert(spark.read.format("graft").load(t)
      .agg(count(lit(1)), sum("id")).head() == expect)
  }

  test("iceberg orphan sweep killed mid-delete: current metadata serves, " +
    "adopted source files untouched, re-run converges") {
    val data = tmpDir("fi_ice_data")
    spark.read.parquet(sf("sf0.001") + "/nation.parquet").repartition(3)
      .write.mode("overwrite").parquet(data)
    val srcFiles = fileCount(data)
    val t = tmpDir("fi_ice")
    gs.sql(s"GRAFT SYNC PARQUET '$data' AS nation TO iceberg '$t'").collect()
    // rewrite: snapshot 2's files live under the table dir; snapshot 1
    // still references the adopted source files
    gs.sql(s"GRAFT DELETE FROM '$t' WHERE n_nationkey = 0").collect()
    val expect = new graft.formats.iceberg.IcebergConversionSource(
      spark, t, "nation").toDataFrame
      .agg(count(lit(1)), sum("n_nationkey")).head()
    // tombstone FIRST: expiration rewrites the metadata before anything
    // is physically deleted
    assert(graft.formats.iceberg.IcebergMaintenance
      .expireSnapshots(t, retainLast = 1).nonEmpty)

    FaultInjection.armDeleteCrash(after = 1)
    crashes {
      graft.formats.iceberg.IcebergMaintenance
        .removeOrphanFiles(spark, t, retentionMillis = 0L)
    }
    assert(new graft.formats.iceberg.IcebergConversionSource(
      spark, t, "nation").toDataFrame
      .agg(count(lit(1)), sum("n_nationkey")).head() == expect,
      "crash mid-sweep corrupted the serveable snapshot")
    assert(fileCount(data) == srcFiles,
      "sweep crossed the table boundary into adopted source files")

    val rerun = graft.formats.iceberg.IcebergMaintenance
      .removeOrphanFiles(spark, t, retentionMillis = 0L)
    assert(rerun.deleted >= 1, "re-run must sweep the remainder")
    assert(graft.formats.iceberg.IcebergMaintenance
      .removeOrphanFiles(spark, t, retentionMillis = 0L).deleted == 0L)
    assert(new graft.formats.iceberg.IcebergConversionSource(
      spark, t, "nation").toDataFrame
      .agg(count(lit(1)), sum("n_nationkey")).head() == expect)
  }

  test("paimon orphan sweep killed mid-delete: head snapshot serves, " +
    "re-run converges") {
    val data = tmpDir("fi_pai_data")
    spark.read.parquet(sf("sf0.001") + "/nation.parquet").repartition(3)
      .write.mode("overwrite").parquet(data)
    val t = tmpDir("fi_pai")
    gs.sql(s"GRAFT SYNC PARQUET '$data' AS nation TO paimon '$t'").collect()
    gs.sql(s"GRAFT DELETE FROM '$t' WHERE n_nationkey = 0").collect()
    val expect = new graft.formats.paimon.PaimonConversionSource(
      spark, t, "nation").toDataFrame
      .agg(count(lit(1)), sum("n_nationkey")).head()
    assert(graft.formats.paimon.PaimonMaintenance
      .expireSnapshots(t, retainLast = 1).nonEmpty)

    FaultInjection.armDeleteCrash(after = 1)
    crashes {
      graft.formats.paimon.PaimonMaintenance
        .removeOrphanFiles(spark, t, retentionMillis = 0L)
    }
    assert(new graft.formats.paimon.PaimonConversionSource(
      spark, t, "nation").toDataFrame
      .agg(count(lit(1)), sum("n_nationkey")).head() == expect,
      "crash mid-sweep corrupted the serveable snapshot")

    val rerun = graft.formats.paimon.PaimonMaintenance
      .removeOrphanFiles(spark, t, retentionMillis = 0L)
    assert(rerun.deleted >= 1, "re-run must sweep the remainder")
    assert(graft.formats.paimon.PaimonMaintenance
      .removeOrphanFiles(spark, t, retentionMillis = 0L).deleted == 0L)
    assert(new graft.formats.paimon.PaimonConversionSource(
      spark, t, "nation").toDataFrame
      .agg(count(lit(1)), sum("n_nationkey")).head() == expect)
  }

  test("hudi clean killed mid-delete: realtime read serves, re-run " +
    "retires the superseded slice") {
    import java.nio.file.{Files => JF, Paths => JP, StandardCopyOption}
    import graft.formats.hudi.{HudiLogFiles, HudiTimeline}
    val t = tmpDir("fi_hudi")
    JF.copy(JP.get(sf("sf0.001") + "/nation.parquet"),
      JP.get(t, "base1.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val base = s"$t/base1.parquet"
    val nation = spark.read.parquet(base)
    HudiTimeline.writeProperties(t, "nation", "MERGE_ON_READ")
    require(HudiTimeline.writeCommit(HudiTimeline.CommitMeta(
      HudiTimeline.newInstant(t), "commit",
      Map("" -> Seq(HudiTimeline.WriteStat(HudiTimeline.fileId(base),
        "base1.parquet", nation.count(), JF.size(JP.get(base))))),
      Map.empty, Map("schema" -> nation.schema.json)), t))
    HudiLogFiles.upsert(spark, t,
      nation.filter(col("n_nationkey") < 5)
        .withColumn("n_regionkey", col("n_regionkey") + 100),
      Seq("n_nationkey"))
    // two upsert+compact rounds -> >= 2 dead files (old base + old logs)
    require(HudiLogFiles.compact(spark, t) > 0)
    val expect = new graft.formats.hudi.HudiConversionSource(
      spark, t, "nation").toDataFrame
      .agg(count(lit(1)), sum("n_regionkey")).head()

    FaultInjection.armDeleteCrash(after = 1)
    crashes {
      graft.formats.hudi.HudiMaintenance.clean(spark, t, retainInstants = 1)
    }
    assert(new graft.formats.hudi.HudiConversionSource(
      spark, t, "nation").toDataFrame
      .agg(count(lit(1)), sum("n_regionkey")).head() == expect,
      "crash mid-clean corrupted the serveable file-group view")

    val rerun = graft.formats.hudi.HudiMaintenance
      .clean(spark, t, retainInstants = 1)
    assert(rerun.deleted >= 1, "re-run must retire the remainder")
    assert(!JF.exists(JP.get(base)),
      "superseded base must be gone after the converged clean")
    assert(new graft.formats.hudi.HudiConversionSource(
      spark, t, "nation").toDataFrame
      .agg(count(lit(1)), sum("n_regionkey")).head() == expect)
  }
}
