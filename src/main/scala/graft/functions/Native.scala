package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Catalyst-Expression bridge for the native kernels' `.of`
  * wrappers. Building the Column DIRECTLY from the expression (instead of
  * the register-on-`SparkSession.active` + `call_function` idiom) removes
  * two defects of the old path: a Column constructed under one session but
  * resolved under another no longer hits an unresolved-function error, and
  * nothing re-registers on every construction. The `register(spark)`
  * entry points remain for SQL-text use of the function names. */
private[graft] object Native {
  def column(e: Expression): Column =
    org.apache.spark.sql.GraftInternal.column(e)
  def expression(c: Column): Expression =
    org.apache.spark.sql.GraftInternal.expression(c)
}
