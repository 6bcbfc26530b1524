package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the latest right row with
  * `right.ts <= left.ts` per key (the time-series join Spark lacks
  * natively; DuckDB spells it ASOF JOIN).
  *
  * Composed from existing operators, per the custom-operator preference
  * order: a tagged union + running `last(..., ignoreNulls)` window. One
  * shuffle on (key) with an ordered window — NO range-condition join, which
  * Catalyst would execute as a broadcast-nested-loop (quadratic per key) at
  * scale. The window form is linear in rows per key and AQE-friendly.
  *
  * Right rows must be unique per (key, ts) — pre-aggregate the right side
  * (an ambiguous as-of match is a data bug, not a tie to break silently).
  */
object AsOfJoin {

  /** Left as-of join: every left row, enriched with `payloadCols` from the
    * latest right row at-or-before its timestamp (nulls when none).
    */
  def lastPrior(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, payloadCols: Seq[String]): DataFrame = {
    val leftOnly = left.columns.toSeq.filterNot(c =>
      c == keyCol || c == tsCol)
    require(leftOnly.intersect(payloadCols).isEmpty,
      s"left/payload column collision: ${leftOnly.intersect(payloadCols)}")

    // tagged union under one schema: right first (side 0) so a right row
    // at the SAME timestamp is visible to the left row (inclusive <=).
    // The payload travels as ONE struct — `last(payload, ignoreNulls)` per
    // column would skip a matched row whose payload value is legitimately
    // NULL (surfacing an older row's value) and could mix values across
    // different right rows; the struct is non-null exactly when the row is
    // a right row, so the window picks the latest right ROW atomically,
    // NULL fields and all (DuckDB ASOF JOIN semantics).
    val payloadStruct = struct(payloadCols.map(col): _*)
    val taggedLeft = left.select(
      Seq(col(keyCol), col(tsCol), lit(1).as("__side"),
        lit(null).cast(right.select(payloadStruct).schema.head.dataType)
          .as("__payload")) ++
        leftOnly.map(col): _*)
    val taggedRight = right.select(
      Seq(col(keyCol), col(tsCol), lit(0).as("__side"),
        payloadStruct.as("__payload")) ++
        leftOnly.map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    taggedLeft.unionByName(taggedRight)
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        Seq(col(keyCol), col(tsCol)) ++
          leftOnly.map(col) ++
          payloadCols.map(p => col("__match")(p).as(p)): _*)
  }
}
