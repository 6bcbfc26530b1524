package graft

import org.apache.spark.sql.SparkSession

import graft.formats.delta.DeltaConversionTarget
import graft.formats.hudi.HudiConversionTarget
import graft.formats.iceberg.IcebergConversionTarget
import graft.model.TableFormats
import graft.sources.ParquetDirectorySource
import graft.spi.{ConversionSource, ConversionTarget}
import graft.sync.{ContinuousSync, ConversionController}
import graft.util.Jsons

/** CLI driver — reference xtable-utilities RunSync.java:240-300.
  *
  * Two config dialects:
  *  - `.yaml`/`.yml`: the REFERENCE's own dataset-config shape
  *    (sourceFormat / targetFormats / datasets[tableBasePath,tableName,
  *    partitionSpec,namespace]) with in-place conversion — see
  *    [[graft.config.DatasetConfig]];
  *  - `.json`: the engine-native shape with explicit per-target paths:
  *
  * {{{
  * { "tableName": "lineitem",
  *   "sourceFormat": "PARQUET" | "DELTA" | "ICEBERG" | "HUDI",
  *   "sourcePath": "/data/lineitem",
  *   "targets": [ {"format": "DELTA", "path": "/tables/li_delta"} ],
  *   "mode": "INCREMENTAL" | "FULL",
  *   "continuous": false, "intervalMillis": 5000, "maxTicks": 3 }
  * }}}
  *
  * Usage: runMain graft.RunSync <config.json|config.yaml>
  */
object RunSync {

  def buildSource(spark: SparkSession, format: String, path: String,
      name: String): ConversionSource = format.toUpperCase match {
    case TableFormats.Parquet => new ParquetDirectorySource(spark, path, name)
    case TableFormats.Delta =>
      new graft.formats.delta.DeltaConversionSource(spark, path, name)
    case TableFormats.Iceberg =>
      new graft.formats.iceberg.IcebergConversionSource(spark, path, name)
    case TableFormats.Hudi =>
      new graft.formats.hudi.HudiConversionSource(spark, path, name)
    case TableFormats.Paimon =>
      new graft.formats.paimon.PaimonConversionSource(spark, path, name)
    case other => throw new IllegalArgumentException(s"source format $other")
  }

  def buildTarget(spark: SparkSession, format: String, path: String)
      : ConversionTarget = format.toUpperCase match {
    case TableFormats.Delta => new DeltaConversionTarget(spark, path)
    case TableFormats.Iceberg => new IcebergConversionTarget(spark, path)
    case TableFormats.Hudi => new HudiConversionTarget(spark, path)
    case TableFormats.Paimon =>
      new graft.formats.paimon.PaimonConversionTarget(spark, path)
    case other => throw new IllegalArgumentException(s"target format $other")
  }

  /** Source for a dataset entry, honoring an explicit partition-spec DSL
    * (only the parquet-directory source takes one; table formats carry
    * their spec in their own metadata).
    */
  private def buildEntrySource(spark: SparkSession, format: String,
      entry: graft.config.DatasetEntry): ConversionSource =
    format.toUpperCase match {
      case TableFormats.Parquet =>
        new ParquetDirectorySource(spark, entry.tableBasePath,
          entry.tableName,
          entry.partitionSpec.map(graft.model.PartitionSpecDSL.parse)
            .getOrElse(Nil))
      case f => buildSource(spark, f, entry.tableBasePath, entry.tableName)
    }

  /** Run every dataset of a reference-shaped YAML config (in-place
    * conversion: target metadata planes land under tableBasePath, exactly
    * like the reference's RunSync). Returns per-dataset outcomes.
    */
  def runYamlConfig(spark: SparkSession, cfgPath: String)
      : Seq[Map[String, Any]] = {
    val cfg = graft.config.DatasetConfig.parseFile(cfgPath)
    cfg.datasets.flatMap { entry =>
      val source = buildEntrySource(spark, cfg.sourceFormat, entry)
      val targets = cfg.targetFormats
        .filterNot(_ == cfg.sourceFormat)
        .map(f => buildTarget(spark, f, entry.tableBasePath))
      val outcomes = new ConversionController().sync(source, targets)
      outcomes.map(o => Map[String, Any](
        "dataset" -> entry.tableName,
        "namespace" -> entry.namespace.orNull,
        "target" -> o.targetFormat, "mode" -> o.mode,
        "status" -> o.status, "lastInstant" -> o.lastInstantSynced,
        "error" -> o.error.orNull))
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: RunSync <config.json|config.yaml>")
    val isYaml = args(0).endsWith(".yaml") || args(0).endsWith(".yml")
    val cfg = if (isYaml) null else Jsons.mapper.readTree(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(args(0))))
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .appName("graft-sync")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      if (isYaml) {
        println(Jsons.toJson(runYamlConfig(spark, args(0))))
        return
      }
      val name = cfg.get("tableName").asText
      val source = buildSource(spark, cfg.get("sourceFormat").asText,
        cfg.get("sourcePath").asText, name)
      import scala.jdk.CollectionConverters._
      val targets = cfg.get("targets").elements().asScala.map { t =>
        buildTarget(spark, t.get("format").asText, t.get("path").asText)
      }.toSeq
      val mode = Option(cfg.get("mode")).map(_.asText)
        .getOrElse(graft.spi.SyncMode.Incremental)
      if (Option(cfg.get("continuous")).exists(_.asBoolean)) {
        val interval = Option(cfg.get("intervalMillis"))
          .map(_.asLong).getOrElse(5000L)
        val maxTicks = Option(cfg.get("maxTicks")).map(_.asLong).getOrElse(3L)
        val cs = new ContinuousSync(source, targets, interval).start()
        cs.awaitTicks(maxTicks)
        cs.stop()
        println(Jsons.toJson(cs.lastOutcomes.map(o => Map(
          "target" -> o.targetFormat, "mode" -> o.mode,
          "status" -> o.status, "lastInstant" -> o.lastInstantSynced))))
      } else {
        val outcomes = new ConversionController().sync(source, targets, mode)
        println(Jsons.toJson(outcomes.map(o => Map(
          "target" -> o.targetFormat, "mode" -> o.mode, "status" -> o.status,
          "lastInstant" -> o.lastInstantSynced,
          "durationMillis" -> o.durationMillis,
          "error" -> o.error.orNull))))
      }
    } catch {
      case e: Exception =>
        // source-side failures (e.g. empty/missing table) report as JSON,
        // not a stack trace
        println(Jsons.toJson(Map("status" -> "ERROR", "error" -> e.toString)))
        spark.stop()
        sys.exit(1)
    } finally spark.stop()
  }
}
