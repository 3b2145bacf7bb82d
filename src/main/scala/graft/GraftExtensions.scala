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
    ext.injectFunction(GraftExtensions.zValueDescription)
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

  /** `graft_zvalue(x, y)`: the Morton interleave of
    * [[graft.graph.Layout.zValue]] rebuilt from raw Catalyst nodes (the
    * SQL registry needs a resolved Expression tree; a bridged Column
    * carries unresolved function nodes in Spark 4). Same magic-number
    * spread, stays in whole-stage codegen, so
    * `OPTIMIZE ... ZORDER`-style layout jobs can be written in SQL. */
  private def buildZValue(children: Seq[Expression]): Expression = {
    require(children.size == 2, "graft_zvalue(x, y) takes exactly two arguments")
    import org.apache.spark.sql.catalyst.expressions.{BitwiseAnd, BitwiseOr, Cast, Literal, ShiftLeft}
    import org.apache.spark.sql.types.LongType
    def spread(x0: Expression): Expression = {
      val x = BitwiseAnd(x0, Literal(0xFFFFL))
      val a = BitwiseAnd(BitwiseOr(x, ShiftLeft(x, Literal(8))), Literal(0x00FF00FFL))
      val b = BitwiseAnd(BitwiseOr(a, ShiftLeft(a, Literal(4))), Literal(0x0F0F0F0FL))
      val c = BitwiseAnd(BitwiseOr(b, ShiftLeft(b, Literal(2))), Literal(0x33333333L))
      BitwiseAnd(BitwiseOr(c, ShiftLeft(c, Literal(1))), Literal(0x55555555L))
    }
    val Seq(x, y) = children.map(Cast(_, LongType))
    BitwiseOr(spread(x), ShiftLeft(spread(y), Literal(1)))
  }

  val zValueDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_zvalue"),
      new ExpressionInfo(graft.graph.Layout.getClass.getName, "graft_zvalue"),
      buildZValue)

  /** Register on an already-running session (sessionState is private[sql],
    * bridged). */
  def register(spark: SparkSession): Unit = {
    org.apache.spark.sql.graftbridge.Bridge.registerFunction(
      spark, "long_vec_dot", buildLongVecDot)
    org.apache.spark.sql.graftbridge.Bridge.registerFunction(
      spark, "md5_prefix64", buildMd5Prefix64)
    org.apache.spark.sql.graftbridge.Bridge.registerFunction(
      spark, "graft_zvalue", buildZValue)
  }
}
