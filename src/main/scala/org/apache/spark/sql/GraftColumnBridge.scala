package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression converters (Spark 4
  * moved them behind `org.apache.spark.sql.classic.ExpressionUtils` when
  * Column became a ColumnNode wrapper). Needed to wrap graft's custom
  * Catalyst expressions (graft.expressions.*) as user-facing Columns
  * without registering session-global functions.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Materialize a custom LogicalPlan as a DataFrame (Dataset.ofRows moved
    * into the classic module in Spark 4).
    */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Analyzed logical plan of a DataFrame (Dataset.logicalPlan is
    * private[sql]).
    */
  def analyzed(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed
}
