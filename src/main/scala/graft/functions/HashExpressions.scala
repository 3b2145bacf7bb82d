package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static MD5-prefix kernel shared by interpreted eval and generated
  * code. A thread-local digest instance avoids a MessageDigest
  * allocation per row (the expression runs once per TOKEN on the text
  * path — billions of calls at corpus scale). */
object HashUtils {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 56 bits of md5(utf8 bytes) as a non-negative long — EXACTLY
    * `conv(substring(md5(s), 1, 14), 16, 10)`: hex chars 1..14 are
    * digest bytes 0..6 big-endian. */
  def md5Prefix64(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 48) | ((d(1) & 0xffL) << 40) | ((d(2) & 0xffL) << 32) |
      ((d(3) & 0xffL) << 24) | ((d(4) & 0xffL) << 16) | ((d(5) & 0xffL) << 8) |
      (d(6) & 0xffL)
  }
}

/** 56-bit md5-prefix word hash as a codegen'd scalar: value-identical to
  * `conv(substring(md5(w),1,14),16,10).cast("long")` (the oracle form)
  * but skips the 32-char hex string materialization and the base-16
  * string parse — digest bytes go straight to a long. The per-token hot
  * path of the whole text family (dictionary-free encoding, SURVEY §7.4
  * custom-Expression route). */
case class Md5Prefix64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix64"

  override def nullSafeEval(input: Any): Any =
    HashUtils.md5Prefix64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashUtils.md5Prefix64($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashFunctions {
  /** 56-bit md5-prefix hash of a string column (codegen'd). */
  def md5_prefix64(c: Column): Column =
    Bridge.column(Md5Prefix64(Bridge.expression(c)))
}
