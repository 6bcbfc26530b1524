package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark's `private[sql]` Column⇄Expression converters so graft's
  * native Catalyst expressions (e.g. rolling_hash) can be exposed as
  * `Column`s. Lives in org.apache.spark.sql purely for access; no Spark
  * internals are modified.
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Re-wrap a batch DataFrame as a STREAMING one (`isStreaming = true`)
    * — the contract a DSv1 `Source.getBatch` must satisfy. This is the
    * delta-spark `DeltaSource` pattern: the micro-batch's rows are the
    * same distributed plan the batch reader builds; only the streaming
    * flag differs, and `internalCreateDataFrame` is the sanctioned
    * (`private[sql]`) way to set it.
    */
  def asStreaming(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd, ds.schema, isStreaming = true)
  }

  /** The inverse, for DSv1 `Sink.addBatch`: the engine hands the batch
    * as a streaming-planned Dataset that batch writers refuse — re-wrap
    * its physical rows as a plain batch DataFrame (delta-spark's
    * DeltaSink does the same).
    */
  def asBatch(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd, ds.schema, isStreaming = false)
  }
}
