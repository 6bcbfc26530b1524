package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

import graft.formats.delta._
import graft.formats.iceberg.IcebergRefs

/** The GRAFT SQL commands as runnable logical plans: each is a
  * `LeafRunnableCommand`, so Spark's own command planner executes it —
  * no custom strategy needed — and every command returns its effect as
  * rows (`spark.sql("GRAFT OPTIMIZE ...")` is a normal DataFrame).
  */
object GraftSqlCommands {

  private def out(names: String*): Seq[Attribute] =
    names.map(n => AttributeReference(n, LongType, nullable = false)())

  /** OPTIMIZE routes by format. The (rewrote, wrote) pair is
    * format-shaped: Delta reports (files rewritten, files written);
    * Iceberg runs the delete-applying [+ z-ordering] REPLACE rewrite
    * and reports (1 if a rewrite committed else 0, live files after);
    * Hudi without ZORDER folds MOR log files into fresh base files
    * (rows compacted twice), with ZORDER rewrites the COW base files
    * clustered as one replacecommit; Paimon bin-packs small files (or
    * clusters with ZORDER) and honours partition-scoped WHERE. The
    * remaining refusals are loud and principled: WHERE on Iceberg (the
    * REPLACE conflict story is pinned whole-table) and on Hudi
    * (compaction/clustering are whole-table).
    */
  case class OptimizeCommand(path: String, zorderBy: Seq[String],
      where: Option[String] = None)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = out("rewrote", "wrote")
    override def run(spark: SparkSession): Seq[Row] = {
      val row = graft.sources.CatalogConversionSource
        .detectFormat(path) match {
        case "DELTA" =>
          val r =
            if (zorderBy.isEmpty) DeltaOptimize.compact(spark, path,
              where = where)
            else DeltaOptimize.zorderBy(spark, path, zorderBy,
              where = where)
          Row(r.rewrote, r.wrote)
        case "ICEBERG" =>
          require(where.isEmpty,
            "GRAFT OPTIMIZE WHERE is not supported on Iceberg — the " +
              "REPLACE rewrite is whole-table")
          val done = graft.formats.iceberg.IcebergDeletes
            .rewriteWithDeletes(spark, path, zorderBy)
          // post-rewrite snapshots carry no delete files, so the
          // listing count is serveable (pre-rewrite it may refuse)
          val after = new graft.formats.iceberg.IcebergConversionSource(
            spark, path, "optimize").currentSnapshot().files.count()
          Row(if (done) 1L else 0L, after)
        case "HUDI" =>
          require(where.isEmpty,
            "GRAFT OPTIMIZE WHERE is not supported on Hudi — log " +
              "compaction and clustering are whole-table")
          if (zorderBy.isEmpty) {
            val n = graft.formats.hudi.HudiLogFiles.compact(spark, path)
            Row(n, n)
          } else {
            val r = graft.formats.hudi.HudiClustering.zorder(spark, path,
              zorderBy)
            Row(r.rewrote, r.wrote)
          }
        case "PAIMON" =>
          val r = graft.formats.paimon.PaimonCompaction.compact(spark,
            path, where = where, zorderBy = zorderBy)
          Row(r.rewrote, r.wrote)
        case other => throw new IllegalArgumentException(
          s"GRAFT OPTIMIZE: unsupported table format $other at $path")
      }
      Seq(row)
    }
  }

  /** VACUUM routes by format, and the RETAIN window means the same thing
    * everywhere: history committed inside the window stays time-travel
    * serveable. Delta sweeps unreferenced files past the retention (log
    * intact); Iceberg and Paimon expire only snapshots OLDER than the
    * window (always keeping the head) then remove orphans past it; Hudi
    * cleans only file slices superseded before the window
    * (KEEP_LATEST_BY_HOURS). `RETAIN 0 HOURS` is the aggressive form:
    * everything but the head goes.
    */
  case class VacuumCommand(path: String, retainHours: Long)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = out("deleted")
    override def run(spark: SparkSession): Seq[Row] = {
      val millis = retainHours * 3600L * 1000L
      val horizon = System.currentTimeMillis() - millis
      val n = graft.sources.CatalogConversionSource.detectFormat(path) match {
        case "DELTA" =>
          DeltaVacuum.vacuum(spark, path, retentionMillis = millis).deleted
        case "ICEBERG" =>
          graft.formats.iceberg.IcebergMaintenance
            .expireSnapshots(path, retainLast = 1,
              olderThanMillis = horizon)
          graft.formats.iceberg.IcebergMaintenance
            .removeOrphanFiles(spark, path, retentionMillis = millis).deleted
        case "HUDI" =>
          graft.formats.hudi.HudiMaintenance
            .clean(spark, path, retainInstants = 1,
              olderThanMillis = horizon).deleted
        case "PAIMON" =>
          graft.formats.paimon.PaimonMaintenance
            .expireSnapshots(path, retainLast = 1,
              olderThanMillis = horizon)
          graft.formats.paimon.PaimonMaintenance
            .removeOrphanFiles(spark, path, retentionMillis = millis).deleted
        case other => throw new IllegalArgumentException(
          s"GRAFT VACUUM: unsupported table format $other at $path")
      }
      Seq(Row(n))
    }
  }

  /** RESTORE routes by format: Delta restores to a log version, Hudi
    * rolls back every instant after the named one (savepoint/restore
    * semantics; `removed` counts the physically deleted files).
    * Iceberg points at GRAFT ROLLBACK — its sequence-based rollback has
    * its own statement.
    */
  case class RestoreCommand(path: String, version: Long)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = out("readded", "removed", "version")
    override def run(spark: SparkSession): Seq[Row] = {
      val row = graft.sources.CatalogConversionSource
        .detectFormat(path) match {
        case "DELTA" =>
          val r = DeltaRestore.restoreTo(spark, path, version)
          Row(r.readded, r.removed, r.version)
        case "HUDI" =>
          val r = graft.formats.hudi.HudiMaintenance.restoreTo(
            spark, path, version.toString)
          Row(0L, r.deletedFiles, version)
        case "ICEBERG" => throw new IllegalArgumentException(
          "GRAFT RESTORE: use GRAFT ROLLBACK '<table>' TO SEQUENCE <n> " +
            "for Iceberg")
        case other => throw new IllegalArgumentException(
          s"GRAFT RESTORE: unsupported table format $other at $path")
      }
      Seq(row)
    }
  }

  /** DELETE/UPDATE route by the table's detected format — one SQL
    * surface over the whole row-level matrix (Delta DVs, Iceberg
    * position deletes, Hudi MOR log records, Paimon file swaps).
    */
  case class DeleteCommand(path: String, predicateSql: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = out("deleted_rows")
    override def run(spark: SparkSession): Seq[Row] = {
      val pred = expr(predicateSql)
      val n = graft.sources.CatalogConversionSource.detectFormat(path) match {
        case "DELTA" => DeltaDeletes.deleteWhere(spark, path, pred)
        case "ICEBERG" =>
          graft.formats.iceberg.IcebergDeletes.deleteWhere(spark, path, pred)
        case "HUDI" =>
          graft.formats.hudi.HudiLogFiles.deleteWhere(spark, path, pred)
        case "PAIMON" =>
          graft.formats.paimon.PaimonDeletes.deleteWhere(spark, path, pred)
        case other => throw new IllegalArgumentException(
          s"GRAFT DELETE: unsupported table format $other at $path")
      }
      Seq(Row(n))
    }
  }

  case class UpdateCommand(path: String, assignments: Seq[(String, String)],
      predicateSql: String) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = out("updated_rows")
    override def run(spark: SparkSession): Seq[Row] = {
      val pred = expr(predicateSql)
      val as = assignments.map { case (c, e) => c -> expr(e) }.toMap
      val n = graft.sources.CatalogConversionSource.detectFormat(path) match {
        case "DELTA" => DeltaDeletes.updateWhere(spark, path, pred, as)
        case "ICEBERG" =>
          graft.formats.iceberg.IcebergDeletes.updateWhere(spark, path,
            pred, as)
        case "HUDI" =>
          graft.formats.hudi.HudiLogFiles.updateWhere(spark, path, pred, as)
        case "PAIMON" =>
          graft.formats.paimon.PaimonDeletes.updateWhere(spark, path,
            pred, as)
        case other => throw new IllegalArgumentException(
          s"GRAFT UPDATE: unsupported table format $other at $path")
      }
      Seq(Row(n))
    }
  }

  /** CREATE (define + initial refresh) or REFRESH a change-feed-
    * maintained materialized aggregate view. Returns the covered source
    * version and group count.
    */
  case class MaterializedViewCommand(mvPath: String,
      create: Option[(String, Seq[String], Seq[String])])
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = out("to_version", "groups")
    override def run(spark: SparkSession): Seq[Row] = {
      create.foreach { case (table, keys, measures) =>
        graft.operators.MaterializedAgg.define(mvPath, table, keys,
          measures)
      }
      val r = graft.operators.MaterializedAgg.refreshDefined(spark, mvPath)
      Seq(Row(r.toVersion, r.groups))
    }
  }

  /** MERGE INTO by key, routed by table format: matched target rows
    * take the source row (whole-row upsert), unmatched source rows
    * insert. Delta masks matched rows with DVs and appends, Iceberg
    * lands equality deletes + appends in one commit, Hudi rides its
    * native MOR upsert, Paimon copy-on-write rewrites the matched
    * files.
    */
  case class MergeCommand(path: String, sourcePath: String,
      keyCols: Seq[String]) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = out("matched_rows",
      "inserted_rows")
    override def run(spark: SparkSession): Seq[Row] = {
      require(keyCols.nonEmpty, "GRAFT MERGE needs >= 1 key column")
      val source = spark.read.parquet(sourcePath)
      val (m, i) = graft.sources.CatalogConversionSource
        .detectFormat(path) match {
        case "DELTA" => DeltaDeletes.mergeInto(spark, path, source, keyCols)
        case "ICEBERG" =>
          graft.formats.iceberg.IcebergDeletes.mergeInto(spark, path,
            source, keyCols)
        case "HUDI" =>
          graft.formats.hudi.HudiLogFiles.mergeInto(spark, path, source,
            keyCols)
        case "PAIMON" =>
          graft.formats.paimon.PaimonDeletes.mergeInto(spark, path,
            source, keyCols)
        case other => throw new IllegalArgumentException(
          s"GRAFT MERGE: unsupported table format $other at $path")
      }
      Seq(Row(m, i))
    }
  }

  case class RollbackCommand(path: String, sequence: Long)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = out("sequence")
    override def run(spark: SparkSession): Seq[Row] = {
      IcebergRefs.rollbackTo(spark, path, sequence)
      Seq(Row(sequence))
    }
  }

  case class RefCommand(path: String, refType: String, name: String,
      atSeq: Option[Long], drop: Boolean) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("name",
        org.apache.spark.sql.types.StringType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] = {
      graft.sources.CatalogConversionSource.detectFormat(path) match {
        case graft.model.TableFormats.Paimon =>
          // Paimon has TAGS (snapshot copies under <table>/tag) — a
          // writable branch is a different feature, refused loudly
          // drop is type-agnostic (the DROP grammar doesn't capture it)
          require(drop || refType.equalsIgnoreCase("TAG"),
            "Paimon supports TAG refs (named snapshots); BRANCH is not " +
              "implemented for Paimon tables")
          if (drop) graft.formats.paimon.PaimonFormat.dropTag(path, name)
          else graft.formats.paimon.PaimonFormat.createTag(path, name,
            atSeq.orElse(graft.formats.paimon.PaimonFormat
              .latestSnapshotId(path)).getOrElse(
              throw new IllegalArgumentException(
                s"no Paimon snapshots at $path to tag")))
        case _ =>
          if (drop) IcebergRefs.dropRef(spark, path, name)
          else IcebergRefs.createRef(spark, path, name, refType, atSeq)
      }
      Seq(Row(name))
    }
  }

  /** SHALLOW CLONE through SQL: `GRAFT CLONE 'src' TO 'dst'
    * [AT VERSION n]`. */
  case class CloneCommand(src: String, dst: String,
      versionAsOf: Option[Long]) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = out("files", "version")
    override def run(spark: SparkSession): Seq[Row] = {
      val r = DeltaClone.shallowClone(spark, src, dst, versionAsOf)
      Seq(Row(r.files, r.version))
    }
  }

  case class SyncCommand(srcPath: String, tableName: String,
      targetFormat: String, targetPath: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("target_format",
        org.apache.spark.sql.types.StringType, nullable = false)(),
      AttributeReference("status",
        org.apache.spark.sql.types.StringType, nullable = false)(),
      AttributeReference("mode",
        org.apache.spark.sql.types.StringType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] = {
      val src = new graft.sources.ParquetDirectorySource(spark, srcPath,
        tableName)
      val target: graft.spi.ConversionTarget =
        targetFormat.toUpperCase match {
          case "DELTA" => new DeltaConversionTarget(spark, targetPath)
          case "ICEBERG" =>
            new graft.formats.iceberg.IcebergConversionTarget(spark,
              targetPath)
          case "HUDI" =>
            new graft.formats.hudi.HudiConversionTarget(spark, targetPath)
          case "PAIMON" =>
            new graft.formats.paimon.PaimonConversionTarget(spark,
              targetPath)
          case other => throw new IllegalArgumentException(
            s"unknown sync target format $other (delta|iceberg|hudi|paimon)")
        }
      new graft.sync.ConversionController().sync(src, Seq(target))
        .map(o => Row(o.targetFormat, o.status, o.mode))
    }
  }

  /** CREATE refuses on an already-indexed column (the MV re-CREATE
    * rule); REFRESH refuses on a missing one. Both land through the
    * same incremental [[graft.plans.BloomIndex.buildOrRefresh]].
    */
  case class BloomIndexCommand(path: String, column: String,
      refreshOnly: Boolean) extends LeafRunnableCommand {
    override val output: Seq[Attribute] =
      out("newly_indexed", "total_live", "bits_per_file")
    override def run(spark: SparkSession): Seq[Row] = {
      val existing = graft.plans.BloomIndex
        .indexedColumns(spark, path).contains(column)
      if (refreshOnly && !existing)
        throw new IllegalArgumentException(
          s"no bloom index on '$column' at $path — CREATE it first")
      if (!refreshOnly && existing)
        throw new IllegalArgumentException(
          s"bloom index on '$column' already exists at $path — " +
            "use GRAFT REFRESH BLOOM INDEX")
      val r = graft.plans.BloomIndex.buildOrRefresh(spark, path, column)
      Seq(Row(r.newlyIndexed, r.totalLive, r.bitsPerFile))
    }
  }

  /** Commit history as rows (version, timestamp_ms, operation) — the
    * `history` metadata table behind a statement; row count = the
    * table's commit count, the one metadata plane that IS driver-sized.
    */
  case class ShowHistoryCommand(path: String) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("version",
        org.apache.spark.sql.types.StringType, nullable = false)(),
      AttributeReference("timestamp_ms", LongType, nullable = false)(),
      AttributeReference("operation",
        org.apache.spark.sql.types.StringType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      spark.read.format("graft").option("metaTable", "history")
        .load(path).collect().toSeq
        .sortBy(r => (r.getLong(1), r.getString(0)))
  }

  case class AlterTableCommand(path: String, op: graft.sync.AlterTable.Op)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("format",
        org.apache.spark.sql.types.StringType, nullable = false)(),
      AttributeReference("schema_ddl",
        org.apache.spark.sql.types.StringType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] = {
      val r = graft.sync.AlterTable.run(spark, path, op)
      Seq(Row(r.format, r.schema.toDDL))
    }
  }
}
