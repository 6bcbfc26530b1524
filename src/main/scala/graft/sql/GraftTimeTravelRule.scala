package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{StringType, TimestampType}

/** SQL time-travel for catalog tables registered `USING graft`:
  * `SELECT ... FROM t VERSION AS OF <v>` and `... TIMESTAMP AS OF <ts>`
  * resolve to the SAME snapshot read the option-based surface serves
  * (`spark.read.format("graft").option("versionAsOf"|"timestampAsOf")`,
  * the `time_travel_*` gates). Spark's analyzer has no V1 time-travel
  * resolution — without this rule the statement dies with an unsupported
  * TIME_TRAVEL error — so the rule rewrites `RelationTimeTravel` over a
  * graft catalog table into the relation the DataFrame reader builds.
  * Versions are format-typed exactly like the option (Delta version /
  * Iceberg sequence / Hudi instant / Paimon snapshot id). Non-graft
  * tables pass through untouched for Spark (or another extension) to
  * resolve.
  *
  * Reference anchor: the reference has no SQL surface at all; delta-spark
  * resolves the same syntax for its own tables in DeltaAnalysis.
  */
case class GraftTimeTravelRule(spark: SparkSession)
  extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case tt @ RelationTimeTravel(u: UnresolvedRelation, ts, version) =>
        graftLocation(u.multipartIdentifier) match {
          case None => tt
          case Some(path) =>
            val reader = spark.read.format("graft")
            version.foreach(v => reader.option("versionAsOf", v))
            ts.foreach { raw =>
              require(raw.foldable,
                s"TIMESTAMP AS OF needs a constant expression, got $raw")
              // this rule runs before ResolveTimeZone — casts inside the
              // expression still lack their session zone; stamp it
              val e = raw.transform {
                case tz: org.apache.spark.sql.catalyst.expressions
                    .TimeZoneAwareExpression if tz.timeZoneId.isEmpty =>
                  tz.withTimeZone(conf.sessionLocalTimeZone)
              }
              val opt = (e.dataType, e.eval(null)) match {
                case (_, null) => throw new IllegalArgumentException(
                  "TIMESTAMP AS OF evaluated to null")
                // timestamp literals evaluate to epoch MICROS; the
                // reader option takes millis
                case (TimestampType, micros: java.lang.Long) =>
                  (micros / 1000L).toString
                case (StringType, s) => s.toString
                case (_, other) => other.toString
              }
              reader.option("timestampAsOf", opt)
            }
            reader.load(path).queryExecution.analyzed
        }
    }

  /** The table's location iff it is a session-catalog entry whose
    * provider is graft; None (pass-through) otherwise.
    */
  private def graftLocation(parts: Seq[String]): Option[String] = {
    val ident = parts match {
      case Seq(t) => TableIdentifier(t)
      case Seq(db, t) => TableIdentifier(t, Some(db))
      case Seq(cat, db, t) if cat.equalsIgnoreCase("spark_catalog") =>
        TableIdentifier(t, Some(db))
      case _ => return None
    }
    scala.util.Try(spark.sessionState.catalog.getTableMetadata(ident))
      .toOption
      .filter(_.provider.exists(_.equalsIgnoreCase("graft")))
      .map(_.location.toString)
  }
}
