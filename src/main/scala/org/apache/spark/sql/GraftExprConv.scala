package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark's `private[sql]` Column ↔ Expression converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`), so graft's native
  * Catalyst expressions can be offered as plain `Column` functions
  * WITHOUT a per-session function-registry round-trip. This is the
  * established extension-library idiom (a one-object file inside the
  * `org.apache.spark.sql` package): the alternative —
  * `call_function("name", ...)` — returns an UNRESOLVED function that
  * only analyzes in sessions that registered the name, which breaks
  * the GraftOps contract that its Column functions work on any
  * DataFrame in any session. Nothing else in the repo lives outside
  * the `graft` namespace; keep it that way.
  */
object GraftExprConv {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
