package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` surface needed to expose a custom
  * Catalyst Expression as a user-facing Column in Spark 4.x (the
  * classic Column-from-Expression constructor moved behind the Spark
  * Connect refactor). Standard extension-library shim pattern.
  */
object SqlShims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
