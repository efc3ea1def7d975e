package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column <-> Expression converters
  * (the supported extension-point surface changed in Spark 4; libraries
  * that add native expressions conventionally bridge from a subpackage
  * of org.apache.spark.sql).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a native expression into a LIVE session's function
    * registry (the spark.sql.extensions config only applies at session
    * build time). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession,
      name: String, info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)

  /** Session-bound Column → catalyst Expression conversion: unlike the
    * lazy [[expression]] above (a ColumnNodeExpression placeholder the
    * ANALYZER unwraps), this converts eagerly — what hand-built logical
    * plans need, where the wrapped node (e.g. a SortOrder) must be a
    * real catalyst node at construction time. */
  def expressionFor(spark: org.apache.spark.sql.SparkSession,
      c: Column): Expression =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .expression(c)

  /** Wrap a hand-built LogicalPlan (e.g. a custom operator node) as a
    * DataFrame — `Dataset.ofRows` is `private[sql]` in Spark 4. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The executor memory-manager page size `SortExec` sizes its sorter
    * pages with (`private[spark]`) — for operators that degrade to an
    * external sort. */
  def pageSizeBytes: Long =
    org.apache.spark.SparkEnv.get.memoryManager.pageSizeBytes

  /** Drain the async listener bus (`private[spark]`) — harness code
    * that reads listener-collected state must flush first. */
  def flushListenerBus(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** Float/double canonicalization (`private[sql]`): 0.0 == -0.0 and
    * one NaN bit pattern, recursively through nested types — what the
    * NormalizeFloatingNumbers optimizer batch applies to Window/
    * Aggregate/Join grouping keys. Custom operators that group by raw
    * key BYTES (the top-k heap) must apply the same canonicalization
    * to their grouping expressions at construction, because that
    * batch runs after the extension rules and only matches the
    * built-in nodes. Non-float expressions pass through unchanged. */
  def normalizeFloats(e: Expression): Expression =
    org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers
      .normalize(e)
}
