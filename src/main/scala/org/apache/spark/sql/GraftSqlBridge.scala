package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Accessor for the `private[sql]` Column ↔ Expression conversions — the
  * supported way to wrap a custom Catalyst expression into the public
  * `Column` API in Spark 4's classic engine.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Eager Column → catalyst conversion. [[expression]] wraps the node in
    * a LAZY `ColumnNodeExpression` that only the DataFrame entry points
    * unwrap; a tree returned from a FunctionRegistry builder (SQL
    * function injection) bypasses those, so it must be converted eagerly
    * or execution hits `Cannot generate code for expression`.
    */
  def catalystExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** Unload every cached state-store provider (`private[sql]`). A
    * stopped streaming query's providers stay in the executor-global
    * cache holding their last in-memory state maps until a maintenance
    * sweep; a bounded-replay harness that starts each replay from a
    * fresh checkpoint can never reuse them, so it should drop them
    * eagerly.
    */
  def unloadAllStateStores(): Unit =
    execution.streaming.state.StateStore.unloadAll()
}
