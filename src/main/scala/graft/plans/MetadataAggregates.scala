package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{coalesce, lit, min => fmin, sum}

/** Metadata-plane `count(*)` pushdown: an unfiltered, ungrouped
  * `SELECT count(*) FROM <graft table>` is answered from the snapshot
  * LISTING's per-file row counts — zero data bytes read. At 100 TB the
  * difference is a metadata aggregate (already a cached, distributed
  * Dataset) versus a full-table parquet scan that exists only to count
  * rows it throws away.
  *
  * Safety gates, all conservative (bail = keep the scan):
  *  - only `Aggregate` with NO grouping whose aggregates are all
  *    `count(<non-null literal>)` (what `count(*)`/`count(1)` resolve
  *    to) or plain literals;
  *  - only over a [[SnapshotFileIndex]]-backed relation, optionally
  *    under pruning `Project`s — any `Filter` in between disqualifies;
  *  - every listed file must carry a positive `recordCount` stat;
  *    formats that didn't record counts fall back to the real scan;
  *  - relations with live deletion vectors never get here — the
  *    format("graft") relation refuses them at load, and the MOR
  *    read-optimized listing is base files only, so the listing count
  *    IS the scan count.
  *
  * The delta-spark twin is OptimizeMetadataOnlyQuery /
  * PrepareDeltaScan's stats-based count; the reference engine has no
  * query optimizer at all (it is metadata-translation only) — this is
  * Spark-first surface on top of its metadata plane.
  */
case class MetadataCountRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // count(*), plus min/max over PARTITION columns (their values are
    // exact in the listing — hive layout stores the column's own value)
    case agg @ Aggregate(Nil, aggExprs, child, _)
        if aggExprs.forall(e => countStarOrLiteral(e) ||
          partMinMax(e).isDefined) =>
      snapshotIndexOf(child) match {
        case Some(index)
            if aggExprs.flatMap(partMinMax).forall { case (_, a) =>
              index.partitionSchema.fieldNames.contains(a.name) } =>
          metadataCount(index) match {
            case Some(n) =>
              val bounds = partitionBounds(index,
                aggExprs.flatMap(partMinMax))
              if (bounds.isEmpty && aggExprs.exists(partMinMax(_).isDefined))
                agg // null partition values — data min/max may differ
              else {
                val row = InternalRow.fromSeq(aggExprs.map { e =>
                  partMinMax(e) match {
                    case Some((isMin, a)) => bounds((isMin, a.name))
                    case None => valueFor(e, n)
                  }
                })
                LocalRelation(agg.output.map(_.asInstanceOf[Attribute]),
                  Seq(row))
              }
            case None => agg
          }
        case _ => agg
      }

    // SELECT DISTINCT <partition cols> / GROUP BY <partition cols> with
    // only count(*)-style aggregates: served from the listing's
    // partition values + per-file row counts — the "what dates exist"
    // query on 100 TB reads zero data bytes
    case agg @ Aggregate(groupings, aggExprs, child, _)
        if groupings.nonEmpty && groupings.forall(_.isInstanceOf[Attribute])
          && aggExprs.forall(e => countStarOrLiteral(e) ||
            groupingRef(e, groupings)) =>
      snapshotIndexOf(child) match {
        case Some(index)
            if groupings.map(_.asInstanceOf[Attribute].name).forall(
              index.partitionSchema.fieldNames.contains) =>
          partitionCounts(index,
            groupings.map(_.asInstanceOf[Attribute].name)) match {
            case Some(perPart) =>
              val rows = perPart.map { case (values, n) =>
                InternalRow.fromSeq(aggExprs.map {
                  case e if countStarOrLiteral(e) => valueFor(e, n)
                  case e =>
                    val a = refOf(e)
                    values(groupings.indexWhere(
                      _.asInstanceOf[Attribute].name == a.name))
                })
              }
              LocalRelation(agg.output.map(_.asInstanceOf[Attribute]), rows)
            case None => agg
          }
        case _ => agg
      }
  }

  /** `min(col)`/`max(col)` over a bare attribute → (isMin, attr). */
  private def partMinMax(e: NamedExpression)
      : Option[(Boolean, Attribute)] = e match {
    case Alias(AggregateExpression(
        org.apache.spark.sql.catalyst.expressions.aggregate.Min(
          a: Attribute), Complete, false, None, _), _) => Some((true, a))
    case Alias(AggregateExpression(
        org.apache.spark.sql.catalyst.expressions.aggregate.Max(
          a: Attribute), Complete, false, None, _), _) => Some((false, a))
    case _ => None
  }

  /** Typed min/max of each requested partition column across the
    * listing's partition values. Empty map signals a null partition
    * value was seen (rows with null in the column — metadata min/max
    * would still be right, but a fully-null partition alongside empty
    * stats is not worth the edge; bail to the scan).
    */
  private def partitionBounds(index: SnapshotFileIndex,
      wanted: Seq[(Boolean, Attribute)]): Map[(Boolean, String), Any] = {
    if (wanted.isEmpty) return Map.empty
    val pSchema = index.partitionSchema
    val listing = index.listing
    import listing.sparkSession.implicits._
    val cols = wanted.map(_._2.name).distinct
    val raw = listing.flatMap { f =>
      cols.map(c =>
        (c, f.partitionValues.find(_.field == c).map(_.value).orNull))
    }.distinct().collect()
    // empty listing (zero-file table): min/max over no values has no
    // metadata answer — bail to the scan, which yields the correct nulls
    if (raw.isEmpty || raw.exists(_._2 == null)) return Map.empty
    wanted.map { case (isMin, a) =>
      val field = pSchema.fields(pSchema.fieldIndex(a.name))
      val typed = raw.filter(_._1 == a.name).map(v =>
        SnapshotFileIndex.catalystValue(v._2, field.dataType))
      val ord = org.apache.spark.sql.catalyst.types.PhysicalDataType
        .ordering(field.dataType).asInstanceOf[Ordering[Any]]
      (isMin, a.name) -> (if (isMin) typed.min(ord) else typed.max(ord))
    }.toMap
  }

  private def refOf(e: NamedExpression): Attribute = e match {
    case a: Attribute => a
    case Alias(a: Attribute, _) => a
    case _ => throw new IllegalStateException(s"not a grouping ref: $e")
  }

  private def groupingRef(e: NamedExpression,
      groupings: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Boolean = e match {
    case a: Attribute => groupings.exists(_.semanticEquals(a))
    case Alias(a: Attribute, _) => groupings.exists(_.semanticEquals(a))
    case _ => false
  }

  /** Distinct partition values + their row counts from the listing.
    * Bails (None) when any file lacks a positive recordCount or a
    * partition value is null — both would make the metadata answer
    * diverge from the scan's. Collect is bounded by the partition
    * count, the same bound catalog partition registration accepts.
    */
  private def partitionCounts(index: SnapshotFileIndex,
      groupCols: Seq[String]): Option[Seq[(Seq[Any], Long)]] = {
    val pSchema = index.partitionSchema
    val listing = index.listing
    import listing.sparkSession.implicits._
    val keyed = listing.map { f =>
      val vals = groupCols.map(c =>
        f.partitionValues.find(_.field == c).map(_.value).orNull)
      (vals, f.recordCount)
    }
    val grouped = keyed.groupByKey(_._1)
      .mapValues { case (_, rc) => (rc, math.min(rc, 1L)) }
      .reduceGroups((a, b) => (a._1 + b._1, math.min(a._2, b._2)))
      .map { case (k, (total, minOk)) => (k, total, minOk) }
      .collect()
    val bad = grouped.exists { case (k, _, minOk) =>
      minOk <= 0L || k.exists(_ == null)
    }
    if (grouped.isEmpty || bad) None
    else Some(grouped.toSeq.map { case (k, total, _) =>
      val typed = k.zip(groupCols).map { case (v, c) =>
        val field = pSchema.fields(pSchema.fieldIndex(c))
        SnapshotFileIndex.catalystValue(v, field.dataType)
      }
      (typed, total)
    })
  }

  private def countStarOrLiteral(e: NamedExpression): Boolean = e match {
    case Alias(AggregateExpression(
        Count(Seq(Literal(v, _))), Complete, false, None, _), _) => v != null
    case Alias(_: Literal, _) => true
    case _ => false
  }

  private def valueFor(e: NamedExpression, count: Long): Any = e match {
    case Alias(AggregateExpression(_: Count, _, _, _, _), _) => count
    case Alias(Literal(v, _), _) => v
    case _ => null // unreachable: countStarOrLiteral gated
  }

  /** The scan under pruning projections — a Filter anywhere breaks the
    * match (its selectivity is a data property the listing can't know;
    * note partition-only filters COULD be served but are left to the
    * scan, which already prunes them from the same listing).
    */
  private def snapshotIndexOf(plan: LogicalPlan): Option[SnapshotFileIndex] =
    plan match {
      case Project(projections, child) if projections.forall(_.deterministic) =>
        snapshotIndexOf(child)
      case LogicalRelation(
          HadoopFsRelation(idx: SnapshotFileIndex, _, _, _, _, _),
          _, _, _, _) =>
        Some(idx)
      case _ => None
    }

  private def metadataCount(index: SnapshotFileIndex): Option[Long] = {
    val listing = index.listing
    val agg = listing
      .agg(coalesce(sum("recordCount"), lit(0L)),
        coalesce(fmin("recordCount"), lit(1L)))
      .head()
    val (total, minCount) = (agg.getLong(0), agg.getLong(1))
    // one file without a recorded count poisons the total — bail to scan
    if (minCount <= 0L) None else Some(total)
  }
}
