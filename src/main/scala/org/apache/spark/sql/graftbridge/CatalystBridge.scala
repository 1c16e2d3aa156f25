package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression <-> Column bridge. Spark 4 made the converters
  * `private[sql]`; this object lives under `org.apache.spark.sql` purely to
  * re-export them to graft's custom expressions (same technique used by
  * open-source Spark extension libraries).
  */
object CatalystBridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly convert a composed Column into a REAL catalyst expression
    * tree (function invocations become catalyst `UnresolvedFunction`s the
    * analyzer resolves on its fixpoint pass). `toExpression`'s lazy
    * `ColumnNodeExpression` wrapper is fine inside Dataset operations but
    * opaque when returned from a `FunctionBuilder` — SQL registration
    * (GraftExtensions) needs this eager form.
    */
  def toResolvableExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
