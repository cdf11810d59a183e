package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.internal.ColumnNode

/**
 * Eager, recursive ColumnNode→Expression conversion. The stock
 * `ExpressionUtils.expression` wraps the node in a LAZY
 * [[ColumnNodeExpression]] (Unevaluable), which the Dataset API converts
 * during its own analysis but the SQL function-registry path hands to
 * codegen unconverted. This converts up front and keeps recursing, since
 * converted trees can nest further lazy wrappers (a Column built from a
 * Catalyst expression whose children were themselves Columns).
 * Lives in `org.apache.spark.sql.classic` because [[ColumnNodeExpression]]
 * is private[classic] — same bridge technique as graft/shims.scala.
 */
object GraftColumnConverter {
  def eager(node: ColumnNode): Expression =
    ColumnNodeToExpressionConverter.apply(node).transformUp {
      case cne: ColumnNodeExpression => eager(cne.node)
    }
}
