package org.apache.spark.sql.classic

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal package-private bridge (the standard Spark-extension technique,
  * cf. frameless/spark-daria) exposing Column⇄Expression conversion to
  * graft's native expressions. Classic (non-Connect) execution only — which
  * is the only mode this engine targets.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
