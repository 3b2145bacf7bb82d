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

  /** Register a custom Expression as a SQL temp function on a LIVE
    * session (sessionState is private[sql] — hence this bridge). The
    * config-time path is `spark.sql.extensions=graft.GraftExtensions`;
    * this is the equivalent for sessions that already exist. */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")
}
