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
    case agg @ Aggregate(Nil, aggExprs, child, _)
        if aggExprs.forall(countStarOrLiteral) =>
      snapshotIndexOf(child) match {
        case Some(index) =>
          metadataCount(index) match {
            case Some(n) =>
              val row = InternalRow.fromSeq(aggExprs.map(valueFor(_, n)))
              LocalRelation(agg.output.map(_.asInstanceOf[Attribute]),
                Seq(row))
            case None => agg
          }
        case None => agg
      }
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
