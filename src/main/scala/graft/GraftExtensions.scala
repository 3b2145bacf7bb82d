package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{LongVecDot, Md5Prefix64}

/** Session-extension entry point: exposes the engine's custom Catalyst
  * expressions to plain SQL (the SURVEY §7.4 extension route) — set
  * `spark.sql.extensions=graft.GraftExtensions` at session build, or
  * call [[GraftExtensions.register]] on a live session. SQL users then
  * get the codegen'd kernel directly:
  * `SELECT long_vec_dot(q, r) FROM vectors` — same Expression the
  * DataFrame API binds via `VecFunctions.vec_dot`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.longVecDotDescription)
    ext.injectFunction(GraftExtensions.md5Prefix64Description)
  }
}

object GraftExtensions {
  private def buildLongVecDot(children: Seq[Expression]): Expression = {
    require(children.size == 2, "long_vec_dot(a, b) takes exactly two arguments")
    LongVecDot(children.head, children(1))
  }

  private def buildMd5Prefix64(children: Seq[Expression]): Expression = {
    require(children.size == 1, "md5_prefix64(s) takes exactly one argument")
    Md5Prefix64(children.head)
  }

  val longVecDotDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("long_vec_dot"),
      new ExpressionInfo(classOf[LongVecDot].getName, "long_vec_dot"),
      buildLongVecDot)

  val md5Prefix64Description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("md5_prefix64"),
      new ExpressionInfo(classOf[Md5Prefix64].getName, "md5_prefix64"),
      buildMd5Prefix64)

  /** Register on an already-running session (sessionState is private[sql],
    * bridged). */
  def register(spark: SparkSession): Unit = {
    org.apache.spark.sql.graftbridge.Bridge.registerFunction(
      spark, "long_vec_dot", buildLongVecDot)
    org.apache.spark.sql.graftbridge.Bridge.registerFunction(
      spark, "md5_prefix64", buildMd5Prefix64)
  }
}
