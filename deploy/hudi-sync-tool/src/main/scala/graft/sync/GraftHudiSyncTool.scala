package graft.sync

import java.util.Properties

import org.apache.hadoop.conf.Configuration
import org.apache.hudi.sync.common.{HoodieSyncConfig, HoodieSyncTool}
import org.apache.spark.sql.SparkSession

/** The FOREIGN-WRITER post-commit hook: a plain Hudi writer (Hudi's own
  * Spark datasource, DeltaStreamer, Flink) configured with
  *
  * {{{
  *   hoodie.meta.sync.enable = true
  *   hoodie.meta.sync.classes = graft.sync.GraftHudiSyncTool
  *   graft.sync.formats = DELTA,ICEBERG        # any of DELTA/ICEBERG/PAIMON
  * }}}
  *
  * gets every commit mirrored into the configured target formats at the
  * same base path, through exactly the controller the CLI/REST/listener
  * paths use (incremental when safe, full fallback otherwise — target
  * bookkeeping decides, [[ConversionController]]).
  *
  * This complements [[SyncOnWrite]], which hooks graft's OWN writes and
  * the Spark listener bus; this class plugs into a writer graft does not
  * control, via Hudi's public `HoodieSyncTool` SPI. Reference:
  * xtable-hudi-support/xtable-hudi-support-extensions/src/main/java/
  * org/apache/xtable/hudi/sync/XTableSyncTool.java:55-67 (same SPI, same
  * per-commit controller run; partition specs there ride a config DSL —
  * graft derives them from the table's own metadata plane instead).
  *
  * Lives in a deployment module (compile-gated against a same-shape SPI
  * stub; Hudi jars are not on the offline classpath — see
  * deploy/hudi-sync-tool/README.md).
  */
class GraftHudiSyncTool(properties: Properties, conf: Configuration)
  extends HoodieSyncTool(properties, conf) {

  /** Comma-separated target formats (DELTA/ICEBERG/PAIMON). */
  val FormatsKey = "graft.sync.formats"

  override def syncHoodieTable(): Unit = {
    val basePath = Option(props.getProperty(
      HoodieSyncConfig.META_SYNC_BASE_PATH)).getOrElse(
      throw new IllegalArgumentException(
        s"${HoodieSyncConfig.META_SYNC_BASE_PATH} not set by the writer"))
    val formats = Option(props.getProperty(FormatsKey)).getOrElse(
      throw new IllegalArgumentException(
        s"$FormatsKey not set (comma-separated: DELTA,ICEBERG,PAIMON)"))
      .split(',').map(_.trim.toUpperCase).filter(_.nonEmpty).toSeq
    require(formats.nonEmpty, s"$FormatsKey is empty")

    // the sync tool runs inside the writer's Spark JVM (Hudi's Spark
    // datasource / DeltaStreamer) — the active session is the contract,
    // matching every other HoodieSyncTool (Hive/Glue sync do the same)
    val spark = SparkSession.active
    val path = graft.util.PathUtils.canonical(basePath)
    val name = Option(props.getProperty("hoodie.table.name"))
      .getOrElse(path.stripSuffix("/").split('/').last)
    val source = new graft.formats.hudi.HudiConversionSource(
      spark, path, name)
    val targets: Seq[graft.spi.ConversionTarget] = formats.map {
      case "DELTA" =>
        new graft.formats.delta.DeltaConversionTarget(spark, path)
      case "ICEBERG" =>
        new graft.formats.iceberg.IcebergConversionTarget(spark, path)
      case "PAIMON" =>
        new graft.formats.paimon.PaimonConversionTarget(spark, path)
      case other => throw new IllegalArgumentException(
        s"unsupported target format '$other' (DELTA, ICEBERG, PAIMON)")
    }
    val outcomes = new ConversionController().sync(source, targets)
    val failing = outcomes.filter(_.status != "SUCCESS")
    if (failing.nonEmpty)
      throw new IllegalStateException(
        "graft sync failed for formats: " +
          failing.map(o => s"${o.targetFormat} (${o.error.getOrElse("")})")
            .mkString(", "))
  }
}
