package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. Spark 4 made the Column/ColumnNode
  * conversion utilities `private[sql]`; this shim (in an org.apache.spark.sql
  * subpackage) re-exports the two calls graft needs to wrap its native
  * expressions ([[graft.functions.VecCosine]]) as Columns. No Spark
  * internals are modified or shadowed.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
