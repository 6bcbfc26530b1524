package graft.formats.delta

import java.util.UUID

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{DvDescriptor, FileEntry}
import graft.util.{HadoopConfs, Jsons, PathUtils}

/** Row-level DELETE and UPDATE on a Delta table via deletion vectors
  * (PROTOCOL.md §Deletion Vectors) — the write-side twin of the
  * DV-applying read. No matched data file is rewritten: each affected
  * file gets ONE new DV holding the union of its previous DV (if any)
  * and the newly matching rows, and the commit replaces the file's `add`
  * (remove + add-with-DV, both dataChange) while upgrading the protocol
  * to readerFeatures=[deletionVectors] — the same action shape
  * delta-spark writes. UPDATE additionally lands the re-written matching
  * rows as NEW data files in the same commit, so the table never shows a
  * state with the rows missing.
  *
  * Scale shape: matching rows and prior DV positions stay distributed;
  * one executor task per affected file builds and writes that file's
  * bitmap; UPDATE's new rows are a plain distributed parquet write. Only
  * per-file descriptors/footers (O(affected files)) reach the driver,
  * which authors the commit JSON — the same bound as every other commit
  * writer in the engine.
  */
object DeltaDeletes {

  private case class DeletePlan(snap: graft.model.TableSnapshot,
      affected: Seq[FileEntry], newDvs: Map[String, DvDescriptor],
      nDeleted: Long)

  /** Delete every live row matching `predicate`; returns the number of
    * newly deleted rows (0 = no match, no commit written).
    */
  def deleteWhere(spark: SparkSession, tablePath: String,
      predicate: Column): Long =
    planDelete(spark, tablePath, predicate) match {
      case None => 0L
      case Some(plan) =>
        commit(spark, tablePath, plan, "DELETE", Iterator.empty)
        plan.nDeleted
    }

  /** Update every live row matching `predicate`: the old rows are masked
    * by DVs and the re-written rows (each `assignments` column replaced)
    * land as new data files — ONE commit, so readers never observe the
    * rows missing. Returns the number of updated rows.
    */
  def updateWhere(spark: SparkSession, tablePath: String,
      predicate: Column, assignments: Map[String, Column]): Long = {
    require(assignments.nonEmpty, "updateWhere needs >= 1 assignment")
    planDelete(spark, tablePath, predicate) match {
      case None => 0L
      case Some(plan) =>
        requireUnpartitioned(plan.snap, "updateWhere")
        val schema = plan.snap.table.schema
        val unknown = assignments.keySet -- schema.fieldNames.toSet
        require(unknown.isEmpty, s"unknown update columns: $unknown")
        val rewritten = DeltaRead.toKeyedDataFrame(spark, plan.snap)
          .filter(predicate)
          .select(schema.fieldNames.toSeq.map { f =>
            assignments.get(f).map(_.as(f)).getOrElse(col(f))
          }: _*)
        val newAdds = writeDataFiles(spark, plan.snap, rewritten, "update")
        commit(spark, tablePath, plan, "UPDATE", newAdds)
        plan.nDeleted
    }
  }

  /** MERGE INTO with upsert semantics — WHEN MATCHED THEN UPDATE SET *,
    * WHEN NOT MATCHED THEN INSERT * — matching target to `source` on
    * equality of `keyCols`. Matched target rows are DV-masked and EVERY
    * source row (updated values and fresh inserts alike) lands as new
    * data files, all in ONE commit. Like delta-spark, refuses a source
    * in which two rows carry the same key (the merge would be
    * ambiguous). Returns (matched, inserted) row counts.
    *
    * Scale shape: the match is a key-equality join the optimizer is free
    * to broadcast (typical CDC batches are small against a 100 TB
    * target); only matched files are re-described, untouched files'
    * `add`s are never rewritten.
    */
  def mergeInto(spark: SparkSession, tablePath: String, source: DataFrame,
      keyCols: Seq[String]): (Long, Long) = {
    import spark.implicits._
    require(keyCols.nonEmpty, "mergeInto needs >= 1 key column")
    val src = new DeltaConversionSource(spark, tablePath,
      PathUtils.canonical(tablePath).stripSuffix("/").split('/').last)
    val snap = src.currentSnapshot()
    requireUnpartitioned(snap, "mergeInto")
    val schema = snap.table.schema
    val missing = schema.fieldNames.toSet -- source.columns.toSet
    require(missing.isEmpty, s"source lacks table columns: $missing")
    require(keyCols.forall(schema.fieldNames.contains),
      s"key columns must exist in the table schema: $keyCols")

    val srcProj = source.select(schema.fieldNames.toSeq.map(col): _*)
      .persist()
    try {
      val srcCount = srcProj.count()
      if (srcCount == 0L) return (0L, 0L)
      val dupKeys = srcProj.groupBy(keyCols.map(col): _*)
        .count().filter(col("count") > 1).limit(1).count()
      require(dupKeys == 0L,
        "mergeInto source has duplicate keys — a target row would match " +
          "more than one source row (same refusal as delta-spark MERGE)")

      // matched live target rows: semi-join the keyed scan against the
      // source keys (broadcast-able; existing DVs already masked)
      val hits = DeltaRead.toKeyedDataFrame(spark, snap)
        .join(srcProj.select(keyCols.map(col): _*), keyCols, "left_semi")
        .select(col("__scan_path"), col("__scan_pos"))
        .as[(String, Long)]
      val plan = planMask(spark, snap, hits)
        .getOrElse(DeletePlan(snap, Nil, Map.empty, 0L))
      val newAdds = writeDataFiles(spark, snap, srcProj, "merge")
      commit(spark, tablePath, plan, "MERGE", newAdds)
      (plan.nDeleted, srcCount - plan.nDeleted)
    } finally srcProj.unpersist()
  }

  private def requireUnpartitioned(snap: graft.model.TableSnapshot,
      op: String): Unit =
    require(snap.table.partitionFields.isEmpty,
      s"$op writes unpartitioned replacement files; partitioned tables " +
        "need partition-aware placement (delete + re-insert through the " +
        "sync path instead)")

  /** Distributed parquet write of `df` under a fresh table-local dir;
    * returns the commit `add` lines (footer row counts, O(new files) on
    * the driver).
    */
  private def writeDataFiles(spark: SparkSession,
      snap: graft.model.TableSnapshot, df: DataFrame,
      prefix: String): Iterator[String] = {
    val tp = snap.table.basePath
    val schema = snap.table.schema
    val dataDir = s"$tp/$prefix-${UUID.randomUUID()}"
    df.write.parquet(dataDir)
    val conf = HadoopConfs.session(spark)
    graft.sources.ParquetFooters.listFiles(dataDir, conf)
      .iterator.map { f =>
        val (rows, _) = graft.sources.ParquetFooters.readFooterStats(
          f.path, conf, Some(Set.empty))
        Jsons.toJson(Map("add" -> Map(
          "path" -> PathUtils.toDeltaUri(PathUtils.relativize(tp, f.path)),
          "partitionValues" -> Map.empty,
          "size" -> f.length,
          "modificationTime" -> f.modifiedMillis,
          "dataChange" -> true,
          "stats" -> DeltaStats.toJson(schema, rows, Nil))))
      }
  }

  /** Compute the per-file union DVs for rows matching `predicate`; None
    * when nothing matches.
    */
  private def planDelete(spark: SparkSession, tablePath: String,
      predicate: Column): Option[DeletePlan] = {
    import spark.implicits._
    val src = new DeltaConversionSource(spark, tablePath,
      PathUtils.canonical(tablePath).stripSuffix("/").split('/').last)
    val snap = src.currentSnapshot()
    // (file, position) of live rows matching the predicate — existing DV
    // positions are already masked out by the keyed read
    val hits = DeltaRead.toKeyedDataFrame(spark, snap)
      .filter(predicate)
      .select(col("__scan_path"), col("__scan_pos"))
      .as[(String, Long)]
    planMask(spark, snap, hits)
  }

  /** Union each hit file's prior DV with its new hit positions and write
    * one DV file per affected data file (executor-side); None when `hits`
    * is empty.
    */
  private def planMask(spark: SparkSession, snap: graft.model.TableSnapshot,
      hits: org.apache.spark.sql.Dataset[(String, Long)])
      : Option[DeletePlan] = {
    import spark.implicits._
    val tp = snap.table.basePath
    val bconf = HadoopConfs.broadcastSession(spark)
    val affectedPaths = hits.toDF("path", "pos").select("path").distinct()

    // prior DV positions of the affected files (the new DV must hold the
    // UNION — the new add replaces the old one wholesale)
    val listing = graft.plans.SnapshotFileIndex.listingFor(snap)
    val prior = listing
      .join(affectedPaths.withColumnRenamed("path", "__ap"),
        col("path") === col("__ap"), "left_semi")
      .filter(col("deletionVector").isNotNull)
      .as[FileEntry]
      .flatMap(f => DeletionVectors.deletedPositions(bconf.value.value, tp,
        f.deletionVector.get).map(p => (f.path, p)))

    // one bitmap + DV file per affected data file, written executor-side
    val newDvs: Map[String, DvDescriptor] = hits.union(prior)
      .groupByKey(_._1)
      .mapGroups { (path, it) =>
        val positions = it.map(_._2).toArray.sorted.toSeq
        val d = DeletionVectors.writeDvFile(bconf.value.value, tp, "",
          UUID.randomUUID(), Seq(positions)).head
        (path, d)
      }.collect().toMap
    if (newDvs.isEmpty) return None

    val affected: Seq[FileEntry] = listing
      .join(affectedPaths.withColumnRenamed("path", "__ap"),
        col("path") === col("__ap"), "left_semi")
      .as[FileEntry].collect().toIndexedSeq
    val nDeleted = newDvs.values.map(_.cardinality).sum -
      affected.flatMap(_.deletionVector).map(_.cardinality).sum
    Some(DeletePlan(snap, affected, newDvs, nDeleted))
  }

  private def commit(spark: SparkSession, tablePath: String,
      plan: DeletePlan, operation: String,
      extraLines: Iterator[String]): Unit = {
    val tp = plan.snap.table.basePath
    val now = System.currentTimeMillis()
    val schema = plan.snap.table.schema
    val header = Iterator(
      // DVs require the table-features protocol with the reader feature
      // flagged (PROTOCOL.md §Deletion Vectors)
      Jsons.toJson(Map("protocol" -> Map(
        "minReaderVersion" -> 3, "minWriterVersion" -> 7,
        "readerFeatures" -> Seq("deletionVectors"),
        "writerFeatures" -> Seq("deletionVectors")))),
      Jsons.toJson(Map("commitInfo" -> Map(
        "timestamp" -> now, "operation" -> operation,
        "operationParameters" -> Map.empty))))
    val dvLines = plan.affected.iterator.flatMap { fe =>
      val d = plan.newDvs(fe.path)
      val rel = PathUtils.toDeltaUri(PathUtils.relativize(tp, fe.path))
      Iterator(
        Jsons.toJson(Map("add" -> Map(
          "path" -> rel,
          "partitionValues" -> fe.partitionValues
            .map(p => p.field -> p.value).toMap,
          "size" -> fe.fileSizeBytes,
          "modificationTime" -> fe.lastModifiedMillis,
          "dataChange" -> true,
          "stats" -> DeltaStats.toJson(schema, fe.recordCount, fe.columnStats),
          "deletionVector" -> Map(
            "storageType" -> d.storageType,
            "pathOrInlineDv" -> d.pathOrInlineDv,
            "offset" -> d.offset,
            "sizeInBytes" -> d.sizeInBytes,
            "cardinality" -> d.cardinality)))),
        Jsons.toJson(Map("remove" -> Map(
          "path" -> rel,
          "deletionTimestamp" -> now,
          "dataChange" -> true))))
    }

    val conf = HadoopConfs.session(spark)
    val version = DeltaLog.listVersions(tablePath, conf).last + 1
    val ok = DeltaLog.writeCommit(tablePath, version,
      header ++ dvLines ++ extraLines)
    if (!ok) throw new IllegalStateException(
      s"concurrent writer committed version $version first at $tablePath")
    graft.plans.SnapshotFileIndex.invalidate(plan.snap)
  }
}
