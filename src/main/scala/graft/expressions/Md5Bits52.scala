package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The first 52 bits of md5(input) as a non-negative long — numerically
  * IDENTICAL to the SQL idiom `conv(substring(md5(x), 1, 13), 16, 10)`
  * used throughout the library for auditable cross-engine draws and
  * bucket slots (13 hex chars = 52 bits, exactly representable in a
  * double), but computed straight from the digest bytes: no hex-string
  * materialization, no base-16 string parse. The SQL chain costs ~3-4 µs
  * per value interpreted through four expression nodes; this kernel is
  * one digest + seven shifts.
  *
  * Swap-in safe anywhere the idiom appears (same value, same oracle
  * SQL); the DuckDB side stays `CAST('0x' || substring(md5(x), 1, 13) AS
  * BIGINT)`. */
case class Md5Bits52(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_md5_bits52 expects a string column, got ${dt.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5_bits52"

  override protected def nullSafeEval(input: Any): Any =
    Md5Bits52.bits52(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Md5Bits52.bits52($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Bits52 =
    copy(child = newChild)
}

object Md5Bits52 {

  // MessageDigest.getInstance per row would dominate; MD5 instances are
  // not thread-safe, so one per executor thread
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static kernel shared by interpreted eval and generated code.
    * First 13 hex nibbles of the digest packed big-endian into a long. */
  def bits52(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 44) |
      ((d(1) & 0xffL) << 36) |
      ((d(2) & 0xffL) << 28) |
      ((d(3) & 0xffL) << 20) |
      ((d(4) & 0xffL) << 12) |
      ((d(5) & 0xffL) << 4) |
      ((d(6) & 0xf0L) >>> 4)
  }
}
