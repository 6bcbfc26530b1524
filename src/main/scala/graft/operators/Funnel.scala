package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered funnel analysis over an event stream: how many users reach
  * stage k having passed stages 1..k-1 IN ORDER (each stage's first
  * qualifying event strictly after the previous stage's).
  *
  * One `groupBy(user).min(ts)` aggregation per stage, chained through
  * equi-joins on the user key — k stages cost k keyed shuffles over
  * per-stage-filtered events (each stage's input is filtered BEFORE the
  * shuffle, so the heavy raw stream is never shuffled whole). No window
  * over the full event history, no per-user event collection: the state
  * per user per stage is one timestamp, which is why the same shape holds
  * at 10^11 events.
  */
object Funnel {

  /** Per-stage reached-user counts: one row per stage, in order. */
  def stageCounts(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    // first-event time per user for stage 1; for stage k, first qualifying
    // event strictly after the user's stage-(k-1) time
    var reached = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t"))
    var out = reached.agg(count(lit(1)).as("n_users"))
      .select(lit(1).as("stage_idx"), lit(stages.head).as("stage"),
        col("n_users"))
    for ((stage, i) <- stages.tail.zipWithIndex) {
      val prev = reached.select(col(userCol), col("t").as("prev_t"))
      reached = events.filter(col(typeCol) === stage)
        .join(prev, Seq(userCol))
        .filter(col(tsCol) > col("prev_t"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("t"))
      out = out.unionAll(reached.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 2).as("stage_idx"), lit(stage).as("stage"),
          col("n_users")))
    }
    out.orderBy("stage_idx")
  }
}
