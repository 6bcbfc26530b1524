package graft.formats.delta

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.{HadoopConfs, Jsons}

/** Delta CHECK constraints (`delta.constraints.<name>` table properties,
  * PROTOCOL.md §CHECK Constraints) and NOT NULL column invariants —
  * enforced on every graft write path (UPDATE/MERGE rewrites, the
  * streaming sink), exactly as delta-spark writers must: a row that
  * violates any live constraint fails the WHOLE write loudly, before any
  * commit is authored.
  *
  * Enforcement is ONE distributed aggregate over the written rows: every
  * constraint folds to a `sum(violates)` column in a single pass — no
  * per-constraint jobs, no row collection; only the per-constraint
  * violation counts reach the driver.
  */
object DeltaConstraints {

  private val Prefix = "delta.constraints."

  /** (name, SQL expression) of every CHECK constraint in the metaData. */
  def checksOf(meta: DeltaMeta): Seq[(String, String)] =
    meta.configuration.collect {
      case (k, v) if k.startsWith(Prefix) => k.stripPrefix(Prefix) -> v
    }.toSeq.sortBy(_._1)

  /** NOT NULL invariants: non-nullable top-level columns of the schema
    * (nested invariants would enforce through a CHECK on the path).
    */
  def notNullsOf(meta: DeltaMeta): Seq[String] =
    meta.schema.fields.filterNot(_.nullable).map(_.name).toSeq

  /** Validate `rows` against every live constraint; throws listing each
    * violated constraint and its row count. No-op (no job) when the
    * table carries no constraints.
    */
  def enforce(rows: DataFrame, meta: DeltaMeta, op: String): Unit = {
    val checks = checksOf(meta).map { case (n, sqlExpr) =>
      s"CHECK $n ($sqlExpr)" ->
        sum(when(not(coalesce(expr(sqlExpr), lit(false))), 1L)
          .otherwise(0L))
    }
    val notNulls = notNullsOf(meta).map { c =>
      s"NOT NULL $c" ->
        sum(when(col(c).isNull, 1L).otherwise(0L))
    }
    val all = checks ++ notNulls
    if (all.isEmpty) return
    val row = rows.agg(all.head._2, all.tail.map(_._2): _*).head()
    val violated = all.zipWithIndex.collect {
      case ((label, _), i) if !row.isNullAt(i) && row.getLong(i) > 0 =>
        s"$label: ${row.getLong(i)} row(s)"
    }
    if (violated.nonEmpty) throw new IllegalArgumentException(
      s"$op violates table constraints — nothing was written:\n  " +
        violated.mkString("\n  "))
  }

  /** Add a CHECK constraint: verifies every EXISTING live row first
    * (delta-spark's ALTER TABLE ADD CONSTRAINT rule), then commits the
    * metaData with the property and a protocol raise to writer version 3
    * (`checkConstraints`). CAS on the observed head.
    */
  def addCheck(spark: SparkSession, tablePath: String, name: String,
      sqlExpr: String): Unit = {
    val conf = HadoopConfs.session(spark)
    val versions = DeltaLog.listVersions(tablePath, conf)
    require(versions.nonEmpty, s"no Delta table at $tablePath")
    val meta = DeltaSnapshot.metadata(spark, tablePath, versions).getOrElse(
      throw new IllegalStateException(s"no metaData at $tablePath"))
    require(!meta.configuration.contains(Prefix + name),
      s"constraint $name already exists")
    val src = new DeltaConversionSource(spark, tablePath,
      graft.util.PathUtils.canonical(tablePath)
        .stripSuffix("/").split('/').last)
    val live = src.toDataFrame
    val bad = live.filter(not(coalesce(expr(sqlExpr), lit(false))))
      .limit(1).count()
    require(bad == 0L,
      s"cannot add CHECK $name ($sqlExpr): existing rows violate it")

    // Preserve whatever protocol the log already holds (a v7 table's
    // feature lists MUST survive — a features-less latest-wins protocol
    // line is invalid per PROTOCOL.md §Table Features); raise only when
    // the table doesn't already license checkConstraints, and skip the
    // protocol line entirely when no raise is needed.
    val existing = DeltaSnapshot.protocolInfo(spark, tablePath, versions)
      .getOrElse(DeltaSnapshot.ProtocolInfo(1, 2, Nil, Nil))
    val protoLine: Iterator[String] =
      if (existing.minWriterVersion >= 7) {
        if (existing.writerFeatures.contains("checkConstraints"))
          Iterator.empty
        else Iterator(Jsons.toJson(Map("protocol" -> (Map[String, Any](
          "minReaderVersion" -> existing.minReaderVersion,
          "minWriterVersion" -> existing.minWriterVersion,
          "writerFeatures" -> (existing.writerFeatures :+
            "checkConstraints").distinct.sorted) ++
          (if (existing.minReaderVersion >= 3)
             Map("readerFeatures" -> existing.readerFeatures.distinct.sorted)
           else Map.empty)))))
      } else if (existing.minWriterVersion >= 3) Iterator.empty
      else Iterator(Jsons.toJson(Map("protocol" -> Map(
        "minReaderVersion" -> existing.minReaderVersion,
        "minWriterVersion" -> 3))))
    val now = System.currentTimeMillis()
    val header = protoLine ++ Iterator(
      Jsons.toJson(Map("metaData" -> Map(
        "id" -> meta.id,
        "format" -> Map("provider" -> "parquet", "options" -> Map.empty),
        "schemaString" -> meta.schemaString,
        "partitionColumns" -> meta.partitionColumns,
        "configuration" -> (meta.configuration + (Prefix + name -> sqlExpr)),
        "createdTime" -> meta.createdTime))),
      Jsons.toJson(Map("commitInfo" -> Map(
        "timestamp" -> now, "operation" -> "ADD CONSTRAINT",
        "operationParameters" -> Map("name" -> name, "expr" -> sqlExpr)))))
    val version = versions.last + 1
    if (!DeltaLog.writeCommit(tablePath, version, header))
      throw new IllegalStateException(
        s"concurrent writer committed version $version first at $tablePath")
  }

  /** Drop a CHECK constraint (metaData-only commit). */
  def dropCheck(spark: SparkSession, tablePath: String, name: String)
      : Unit = {
    val conf = HadoopConfs.session(spark)
    val versions = DeltaLog.listVersions(tablePath, conf)
    val meta = DeltaSnapshot.metadata(spark, tablePath, versions).getOrElse(
      throw new IllegalStateException(s"no metaData at $tablePath"))
    require(meta.configuration.contains(Prefix + name),
      s"no constraint $name at $tablePath")
    val now = System.currentTimeMillis()
    val header = Iterator(
      Jsons.toJson(Map("metaData" -> Map(
        "id" -> meta.id,
        "format" -> Map("provider" -> "parquet", "options" -> Map.empty),
        "schemaString" -> meta.schemaString,
        "partitionColumns" -> meta.partitionColumns,
        "configuration" -> (meta.configuration - (Prefix + name)),
        "createdTime" -> meta.createdTime))),
      Jsons.toJson(Map("commitInfo" -> Map(
        "timestamp" -> now, "operation" -> "DROP CONSTRAINT",
        "operationParameters" -> Map("name" -> name)))))
    val version = versions.last + 1
    if (!DeltaLog.writeCommit(tablePath, version, header))
      throw new IllegalStateException(
        s"concurrent writer committed version $version first at $tablePath")
  }
}
