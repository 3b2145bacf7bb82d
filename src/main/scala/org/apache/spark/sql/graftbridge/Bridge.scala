package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to spark-sql's package-private Column ↔ Expression converters
  * (org.apache.spark.sql.classic.ExpressionUtils is private[sql] in
  * Spark 4) — the supported pattern for libraries that ship custom
  * Catalyst expressions without going through the SQL function registry.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
