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

  /** Serializable, lazily-codegen'd row ordering for custom physical
    * operators (the same mechanism TakeOrderedAndProjectExec uses). */
  def rowOrdering(sortOrder: Seq[org.apache.spark.sql.catalyst.expressions.SortOrder],
                  input: Seq[org.apache.spark.sql.catalyst.expressions.Attribute])
  : Ordering[org.apache.spark.sql.catalyst.InternalRow] =
    new org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering(sortOrder, input)
}
