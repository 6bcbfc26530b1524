package graft

import org.apache.spark.sql.functions._

import graft.formats.delta._
import graft.sources.ParquetDirectorySource
import graft.sync.TableFormatSync

/** Delta Change Data Feed (PROTOCOL.md §Add CDC File): with
  * `delta.enableChangeDataFeed=true` the row-level writers author
  * `_change_data/` sidecars + `cdc` actions carrying the full spec
  * change-type vocabulary, and `changesBetween` reads those verbatim;
  * without the property, commits reconstruct from touched files. The
  * two paths must agree wherever both can answer.
  */
class ChangeDataFeedSpec extends SparkSuite {

  private def syncToDelta(srcDir: String, name: String,
      spec: Seq[graft.model.PartitionFieldSpec] = Nil): String = {
    val target = tmpDir("cdf_delta")
    val src = new ParquetDirectorySource(spark, srcDir, name, spec)
    val out = TableFormatSync.syncSnapshot(
      Seq(new DeltaConversionTarget(spark, target)),
      src.currentSnapshot(), src.sourceFormat)
    assert(out.forall(_.status == "SUCCESS"), out.mkString(";"))
    target
  }

  private def stageTable(prefix: String, table: String,
      nFiles: Int): String = {
    val dataDir = tmpDir(prefix)
    spark.read.parquet(sf("sf0.001") + s"/$table.parquet")
      .repartition(nFiles).write.mode("overwrite").parquet(dataDir)
    dataDir
  }

  private def feedByType(table: String, from: Long, to: Long)
      : Map[String, Long] =
    DeltaChanges.changesBetween(spark, table, from, to)
      .groupBy("_change_type").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap

  test("CDC sidecars carry the spec change-type vocabulary") {
    import spark.implicits._
    val table = syncToDelta(stageTable("cdf_data", "customer", 4), "customer")
    val v0 = DeltaChanges.enableChangeDataFeed(spark, table)
    val customer = spark.read.parquet(sf("sf0.001") + "/customer.parquet")
    val nNeg = customer.filter(col("c_acctbal") < 0).count()
    assert(DeltaDeletes.deleteWhere(spark, table,
      col("c_acctbal") < 0) == nNeg)

    def live() = new DeltaConversionSource(spark, table, "customer")
      .toDataFrame
    val nUpd = live().filter(col("c_custkey") % 10 === 0).count()
    assert(DeltaDeletes.updateWhere(spark, table, col("c_custkey") % 10 === 0,
      Map("c_acctbal" -> (col("c_acctbal") + 50.0))) == nUpd)

    val src = live().filter(col("c_custkey") % 10 === 3)
      .withColumn("c_acctbal", col("c_acctbal") - 5.0)
      .unionByName(live().filter(col("c_custkey") % 10 === 4)
        .withColumn("c_custkey", col("c_custkey") + 7000000L))
    val nMatched = live().filter(col("c_custkey") % 10 === 3).count()
    val nFresh = live().filter(col("c_custkey") % 10 === 4).count()
    assert(DeltaDeletes.mergeInto(spark, table, src,
      Seq("c_custkey")) == (nMatched, nFresh))

    val head = DeltaLog.latestVersion(table,
      graft.util.HadoopConfs.session(spark)).get
    val byType = feedByType(table, v0, head)
    assert(byType == Map(
      "delete" -> nNeg,
      "update_preimage" -> (nUpd + nMatched),
      "update_postimage" -> (nUpd + nMatched),
      "insert" -> nFresh), byType.toString)

    // every write op's commit holds cdc actions, and the sidecars live
    // under _change_data (outside every data-plane listing)
    val conf = graft.util.HadoopConfs.session(spark)
    (v0 + 1 to head).foreach { v =>
      val lines = scala.io.Source.fromFile(
        DeltaLog.versionFile(table, v)).getLines().toSeq
      assert(lines.exists(_.contains("\"cdc\"")), s"version $v has no cdc")
      assert(lines.filter(_.contains("\"cdc\""))
        .forall(_.contains(DeltaChanges.ChangeDir)))
    }
    // cdc files never pollute the table read
    assert(live().count() ==
      customer.count() - nNeg + nFresh)

    // pre-images carry pre-update values: sum over update_preimage equals
    // the live sum at the moment of the update
    val feed = DeltaChanges.changesBetween(spark, table, v0, head)
    val preSum = feed.filter(col("_change_type") === "update_preimage")
      .agg(sum(col("c_acctbal").cast("double"))).as[Double].head()
    val postSum = feed.filter(col("_change_type") === "update_postimage")
      .agg(sum(col("c_acctbal").cast("double"))).as[Double].head()
    assert(math.abs(postSum - (preSum + 50.0 * nUpd - 5.0 * nMatched)) < 1e-3,
      s"pre=$preSum post=$postSum")
  }

  test("a disabled table reconstructs; enabled and disabled agree on DELETE") {
    val plain = syncToDelta(stageTable("cdf_plain", "nation", 2), "nation")
    val cdc = syncToDelta(stageTable("cdf_cdc", "nation", 2), "nation")
    val v0 = DeltaChanges.enableChangeDataFeed(spark, cdc)
    val pred = col("n_regionkey") === 1
    val nPlain = DeltaDeletes.deleteWhere(spark, plain, pred)
    val nCdc = DeltaDeletes.deleteWhere(spark, cdc, pred)
    assert(nPlain == nCdc && nPlain > 0)
    assert(!new java.io.File(plain, DeltaChanges.ChangeDir).exists(),
      "disabled table must not author CDC sidecars")
    assert(new java.io.File(cdc, DeltaChanges.ChangeDir).exists())

    val cols = Seq("n_nationkey", "n_name", "n_regionkey", "_change_type")
    val plainRows = DeltaChanges.changesBetween(spark, plain, 0L, 1L)
      .select(cols.map(col): _*)
      .orderBy("n_nationkey").collect().toSeq
    val cdcRows = DeltaChanges.changesBetween(spark, cdc, v0, v0 + 1)
      .select(cols.map(col): _*)
      .orderBy("n_nationkey").collect().toSeq
    assert(plainRows == cdcRows)
  }

  test("mixed ranges union reconstruction and CDC per commit") {
    import spark.implicits._
    val dataDir = stageTable("cdf_mixed", "nation", 1)
    val table = syncToDelta(dataDir, "nation")
    val v0 = DeltaChanges.enableChangeDataFeed(spark, table)
    // an incremental sync append (no cdc action, dataChange=true) ...
    spark.read.parquet(sf("sf0.001") + "/nation.parquet")
      .withColumn("n_nationkey", (col("n_nationkey") + 100).cast("int"))
      .coalesce(1).write.mode("append").parquet(dataDir)
    val src = new ParquetDirectorySource(spark, dataDir, "nation")
    val target = new DeltaConversionTarget(spark, table)
    val out = TableFormatSync.syncSnapshot(Seq(target),
      src.currentSnapshot(), src.sourceFormat)
    assert(out.forall(_.status == "SUCCESS"))
    // ... then a CDC delete
    assert(DeltaDeletes.deleteWhere(spark, table,
      col("n_nationkey") >= 100L && col("n_nationkey") % 2 === 0) > 0)
    val head = DeltaLog.latestVersion(table,
      graft.util.HadoopConfs.session(spark)).get
    val byType = feedByType(table, v0, head)
    val n = spark.read.parquet(sf("sf0.001") + "/nation.parquet").count()
    assert(byType == Map("insert" -> n, "delete" -> (n + 1) / 2),
      byType.toString)
    // the metaData-only enable commit contributes nothing
    assert(DeltaChanges.changesBetween(spark, table, v0 - 1, v0)
      .count() == 0L)
  }

  test("the unified reader serves the feed via readChangeFeed") {
    val table = syncToDelta(stageTable("cdf_reader", "nation", 2), "nation")
    val v0 = DeltaChanges.enableChangeDataFeed(spark, table)
    assert(DeltaDeletes.deleteWhere(spark, table,
      col("n_regionkey") === 2) > 0)
    val feed = spark.read.format("graft")
      .option("readChangeFeed", "true")
      .option("startingVersion", v0.toString)
      .load(table)
    assert(feed.columns.contains("_change_type") &&
      feed.columns.contains("_commit_version"))
    val want = DeltaChanges.changesBetween(spark, table, v0, v0 + 1).count()
    assert(feed.count() == want && want > 0)
    // a plain-parquet table refuses loudly
    val err = intercept[IllegalArgumentException] {
      spark.read.format("graft")
        .option("readChangeFeed", "true").option("startingVersion", "0")
        .load(stageTable("cdf_reader_plain", "region", 1)).count()
    }
    assert(err.getMessage.contains("versioned metadata plane"))
  }

  test("partitioned tables route CDC files and restore partition columns") {
    import spark.implicits._
    val stage = tmpDir("cdf_part_stage") + "/t"
    spark.read.parquet(sf("sf0.001/nation.parquet"))
      .write.partitionBy("n_regionkey").parquet(stage)
    val table = syncToDelta(stage, "nation")
    val v0 = DeltaChanges.enableChangeDataFeed(spark, table)
    val n = DeltaDeletes.deleteWhere(spark, table, col("n_nationkey") % 2 === 0)
    assert(n > 0)
    val feed = DeltaChanges.changesBetween(spark, table, v0, v0 + 1)
    val want = spark.read.parquet(sf("sf0.001/nation.parquet"))
      .filter(col("n_nationkey") % 2 === 0)
      .select("n_nationkey", "n_regionkey")
      .as[(Long, Long)].collect().toMap
    val got = feed.select("n_nationkey", "n_regionkey")
      .as[(Long, Long)].collect().toMap
    assert(got == want, "partition column values must ride back in")
    // the sidecars themselves are partition-routed on disk
    val cd = new java.io.File(table, DeltaChanges.ChangeDir)
    val parts = cd.listFiles().flatMap(_.listFiles())
      .filter(_.isDirectory).map(_.getName)
    assert(parts.exists(_.startsWith("n_regionkey=")), parts.toSeq.toString)
  }
}
