package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.sources.ParquetDirectorySource
import graft.sync.{ConversionController, TableFormatSync}

/** `spark.read.format("graft")`: one reader API across all converted
  * formats, scan driven by the metadata plane.
  */
class GraftDataSourceSpec extends SparkSuite {

  test("reads delta, iceberg, hudi, paimon and parquet by detection") {
    val src = new ParquetDirectorySource(
      spark, sf("sf0.001") + "/supplier.parquet", "supplier")
    val expected = spark.read.parquet(sf("sf0.001") + "/supplier.parquet").count()

    val deltaDir = tmpDir("gds_delta")
    val iceDir = tmpDir("gds_ice")
    val hudiDir = tmpDir("gds_hudi")
    val paimonDir = tmpDir("gds_paimon")
    val out = TableFormatSync.syncSnapshot(Seq(
      new graft.formats.delta.DeltaConversionTarget(spark, deltaDir),
      new graft.formats.iceberg.IcebergConversionTarget(spark, iceDir),
      new graft.formats.hudi.HudiConversionTarget(spark, hudiDir),
      new graft.formats.paimon.PaimonConversionTarget(spark, paimonDir)),
      src.currentSnapshot(), src.sourceFormat)
    assert(out.forall(_.status == "SUCCESS"), out.mkString(";"))

    // one reader API for every converted table
    for ((fmt, dir) <- Seq("delta" -> deltaDir, "iceberg" -> iceDir,
        "hudi" -> hudiDir, "paimon" -> paimonDir)) {
      val n = spark.read.format("graft").load(dir).count()
      assert(n == expected, s"$fmt via graft reader: $n != $expected")
    }
    // plain parquet dir detects as PARQUET
    assert(spark.read.format("graft")
      .load(sf("sf0.001") + "/supplier.parquet").count() == expected)
  }

  test("delta time travel through the reader option") {
    val dataDir = tmpDir("gds_tt_data")
    val target = tmpDir("gds_tt_delta")
    val srcFile = Paths.get(sf("sf0.001/region.parquet"))
    Files.copy(srcFile, Paths.get(dataDir, "f1.parquet"))
    Paths.get(dataDir, "f1.parquet").toFile.setLastModified(1000000L)
    val controller = new ConversionController
    def src = new ParquetDirectorySource(spark, dataDir, "region")
    controller.sync(src, Seq(
      new graft.formats.delta.DeltaConversionTarget(spark, target)))
    Files.copy(srcFile, Paths.get(dataDir, "f2.parquet"))
    Paths.get(dataDir, "f2.parquet").toFile.setLastModified(2000000L)
    controller.sync(src, Seq(
      new graft.formats.delta.DeltaConversionTarget(spark, target)))

    val latest = spark.read.format("graft").load(target).count()
    val v0 = spark.read.format("graft")
      .option("versionAsOf", "0").load(target).count()
    assert(latest == 2 * v0 && v0 > 0, s"v0=$v0 latest=$latest")
  }

  test("versionAsOf time-travels Iceberg sequence numbers too") {
    val target = tmpDir("gds_tt_ice")
    val src = new ParquetDirectorySource(spark,
      sf("sf0.001/region.parquet"), "region")
    TableFormatSync.syncSnapshot(Seq(
      new graft.formats.iceberg.IcebergConversionTarget(spark, target)),
      src.currentSnapshot(), src.sourceFormat)
    val copyDir = tmpDir("gds_tt_ice_copy")
    spark.read.parquet(sf("sf0.001/region.parquet"))
      .write.mode("overwrite").parquet(copyDir)
    graft.formats.iceberg.IcebergDeletes.appendDataFiles(spark, target,
      copyDir)
    val latest = spark.read.format("graft").load(target).count()
    val v1 = spark.read.format("graft")
      .option("versionAsOf", "1").load(target).count()
    assert(latest == 2 * v1 && v1 > 0, s"v1=$v1 latest=$latest")
  }

  test("withRowLineage surfaces v3 row ids through the unified reader") {
    import org.apache.spark.sql.functions.col
    val target = tmpDir("gds_lineage_ice")
    val stage = tmpDir("gds_lineage_stage")
    spark.read.parquet(sf("sf0.001/nation.parquet"))
      .repartition(1).sortWithinPartitions("n_nationkey")
      .write.mode("overwrite").parquet(stage)
    val src = new ParquetDirectorySource(spark, stage, "nation")
    TableFormatSync.syncSnapshot(Seq(
      new graft.formats.iceberg.IcebergConversionTarget(spark, target)),
      src.currentSnapshot(), src.sourceFormat)

    // on a v2 table the option refuses with the upgrade pointer
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft").option("withRowLineage", "true")
        .load(target).count()
    }
    assert(e.getMessage.contains("format-version 3"), e.getMessage)

    assert(graft.formats.iceberg.IcebergDeletes.upgradeToV3(spark, target))
    def lineage(): Map[Long, (Long, Long)] = spark.read.format("graft")
      .option("withRowLineage", "true").load(target)
      .select(col("n_nationkey"), col("_row_id"),
        col("_last_updated_sequence_number"))
      .collect()
      .map(r => (r.getAs[Number](0).longValue,
        (r.getLong(1), r.getLong(2)))).toMap
    val ids0 = lineage()
    // single sorted file: id == rank of the key
    assert(ids0.keys.toSeq.sorted.zipWithIndex.forall {
      case (k, i) => ids0(k)._1 == i.toLong })

    // an update keeps the id and advances the last-updated sequence
    graft.formats.iceberg.IcebergDeletes.updateWhere(spark, target,
      col("n_nationkey") === 7, Map("n_name" ->
        org.apache.spark.sql.functions.lit("x")))
    val ids1 = lineage()
    assert(ids1(7L)._1 == ids0(7L)._1 && ids1(7L)._2 > ids0(7L)._2)
    assert((ids1 - 7L) == (ids0 - 7L))

    // lineage + time travel is refused (no silent wrong-version lineage)
    val e2 = intercept[IllegalArgumentException] {
      spark.read.format("graft").option("withRowLineage", "true")
        .option("versionAsOf", "1").load(target).count()
    }
    assert(e2.getMessage.contains("withRowLineage"), e2.getMessage)
  }

  test("filters push into the metadata-plane scan") {
    val target = tmpDir("gds_push")
    val src = new ParquetDirectorySource(
      spark, sf("sf0.001") + "/supplier.parquet", "supplier")
    TableFormatSync.syncSnapshot(Seq(
      new graft.formats.delta.DeltaConversionTarget(spark, target)),
      src.currentSnapshot(), src.sourceFormat)
    val df = spark.read.format("graft").load(target)
      .filter(col("s_suppkey") > 5).select("s_suppkey", "s_name")
    val scan = df.queryExecution.executedPlan
      .collectFirst { case f: FileSourceScanExec => f }
    assert(scan.isDefined)
    // data filter reached the parquet scan; projection pruned the schema
    assert(scan.get.dataFilters.nonEmpty, scan.get.toString)
    assert(scan.get.requiredSchema.fieldNames.toSet ==
      Set("s_suppkey", "s_name"))
    assert(df.count() == spark.read
      .parquet(sf("sf0.001") + "/supplier.parquet")
      .filter(col("s_suppkey") > 5).count())
  }

  test("metadata tables: partitioned files, partitions roll-up, history") {
    val dataDir = tmpDir("meta_part_data")
    spark.read.parquet(sf("sf0.001") + "/nation.parquet")
      .repartition(col("n_regionkey"))
      .write.mode("overwrite").partitionBy("n_regionkey").parquet(dataDir)
    val t = tmpDir("meta_part_delta")
    val src = new graft.sources.ParquetDirectorySource(spark, dataDir,
      "nation")
    val out = graft.sync.TableFormatSync.syncSnapshot(
      Seq(new graft.formats.delta.DeltaConversionTarget(spark, t)),
      src.currentSnapshot(), src.sourceFormat)
    assert(out.forall(_.status == "SUCCESS"))
    def meta(which: String) = spark.read.format("graft")
      .option("metaTable", which).load(t)
    val parts = meta("partitions").collect()
    assert(parts.length == 5)   // five regions
    assert(parts.map(_.getAs[Long]("n_records")).sum ==
      spark.read.parquet(sf("sf0.001") + "/nation.parquet").count())
    val files = meta("files")
    assert(files.select("partition_values").collect()
      .forall(_.getAs[Map[String, String]](0).contains("n_regionkey")))
    val hist = meta("history").collect()
    assert(hist.length == 1 && hist(0).getAs[String]("operation")
      == "GRAFT SYNC")

    // iceberg history comes from the snapshot list
    val ice = tmpDir("meta_part_ice")
    val out2 = graft.sync.TableFormatSync.syncSnapshot(
      Seq(new graft.formats.iceberg.IcebergConversionTarget(spark, ice)),
      src.currentSnapshot(), src.sourceFormat)
    assert(out2.forall(_.status == "SUCCESS"))
    val ihist = spark.read.format("graft").option("metaTable", "history")
      .load(ice).collect()
    assert(ihist.length == 1 && ihist(0).getAs[String]("version") == "1")
  }

  test("writer: partitioned saves, save modes, drift and constraints") {
    val nation = spark.read.parquet(sf("sf0.001") + "/nation.parquet")
    val t = tmpDir("writer_part")
    nation.write.format("graft").partitionBy("n_regionkey")
      .mode("append").save(t)
    // reads route through the metadata plane with partition pruning
    val one = spark.read.format("graft").load(t)
      .filter(col("n_regionkey") === 2)
    assert(one.count() == nation.filter(col("n_regionkey") === 2).count())
    assert(spark.read.format("graft").option("metaTable", "partitions")
      .load(t).count() == 5)
    // appends must keep the partitioning; a mismatch refuses
    intercept[IllegalArgumentException] {
      nation.write.format("graft").partitionBy("n_nationkey")
        .mode("append").save(t)
    }
    // ErrorIfExists / Ignore contracts
    intercept[IllegalArgumentException] {
      nation.write.format("graft").mode("error").save(t)
    }
    nation.write.format("graft").mode("ignore").save(t)   // no-op
    assert(spark.read.format("graft").load(t).count() == nation.count())
    // schema drift refuses before anything commits
    intercept[IllegalArgumentException] {
      nation.drop("n_name").write.format("graft").mode("append").save(t)
    }
    // CHECK constraints bind the writer path too
    graft.formats.delta.DeltaConstraints.addCheck(spark, t, "keycap",
      "n_nationkey < 1000")
    intercept[IllegalArgumentException] {
      nation.withColumn("n_nationkey", col("n_nationkey") + 5000)
        .write.format("graft").mode("append").save(t)
    }
    assert(spark.read.format("graft").load(t).count() == nation.count())
  }
}
