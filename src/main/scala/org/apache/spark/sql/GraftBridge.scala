package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into the `private[sql]` Column↔Expression converters —
  * the standard pattern for registering custom Catalyst expressions from
  * an external library without forking Spark. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a custom expression under a SQL-callable name on an
    * existing session (the per-session analog of injecting it through
    * `SparkSessionExtensions` at session build time). */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Eager Column→Expression conversion. `expression` defers through a
    * lazy `ColumnNodeExpression`, which is fine inside standard nodes
    * (the analyzer's converter rewrites them) but a sort Column must
    * surface its catalyst `SortOrder` NOW so callers can pattern-match
    * direction/null ordering. */
  def eagerExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Build a DataFrame from a (possibly custom) logical plan. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan behind a DataFrame. */
  def logicalPlan(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed

  /** Per-session hook for extra planner strategies / optimizer rules. */
  def experimental(spark: SparkSession): ExperimentalMethods =
    spark.asInstanceOf[classic.SparkSession].experimental

  /** The running task's memory manager (`private[spark]` on
    * TaskContext) — needed to create memory-managed spillable buffers
    * from library code. */
  def taskMemoryManager(tc: org.apache.spark.TaskContext)
      : org.apache.spark.memory.TaskMemoryManager =
    tc.taskMemoryManager()
}
