package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the private[sql] Column↔Expression converters — the standard
  * escape hatch for third-party connectors registering native expressions
  * (Spark 4 removed the public Column(expr) constructor). */
object GraftShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Catalyst predicate -> DSv1 `sources.Filter` (the filter-compiler
    * currency) — used by the logical index-semi-join rule, which must make
    * the same pushability/selectivity judgments at OPTIMIZER time that the
    * scan builder makes at pushdown time. */
  def translateFilter(e: Expression): Option[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.execution.datasources.DataSourceStrategy
      .translateFilter(e, supportNestedPredicatePushdown = false)
}
