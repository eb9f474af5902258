package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE compression ratio of a string column: compressed bytes /
  * raw UTF-8 bytes. The classic corpus-quality signal (used by the
  * published Gopher / RefinedWeb filtering rules): machine-generated or
  * template text compresses far below natural prose, and random/binary
  * junk barely compresses at all — so both filtering tails hang off this
  * one number. Empty strings have no defined ratio and return null.
  *
  * Per-row kernel with no state shared across TASKS: each executor
  * thread recycles ITS OWN Deflater + scratch buffer via ThreadLocal
  * (reset() between rows — Deflater is not thread-safe, but per-thread
  * reuse avoids a native allocation per row; the per-thread native
  * memory is held for the executor thread's lifetime), so it scales as
  * a pure map pass; stays inside whole-stage codegen via a generated
  * call to the static kernel. Level 6 (the zlib
  * default) balances signal quality against CPU; the ratio is
  * deterministic for a given JVM's zlib, and downstream contracts must
  * only depend on ORDERING (repetitive < prose < random), which is
  * stable across zlib builds. */
case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_deflate_ratio expects a string column, got ${dt.sql}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_deflate_ratio"

  override protected def nullSafeEval(input: Any): Any =
    DeflateRatio.ratio(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val v = ctx.freshName("ratioBoxed")
    nullSafeCodeGen(ctx, ev, c =>
      s"""java.lang.Double $v = graft.expressions.DeflateRatio.ratio($c);
         |if ($v == null) { ${ev.isNull} = true; } else { ${ev.value} = $v; }
         |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}

object DeflateRatio {

  // Deflater is not thread-safe and native init/teardown per row would
  // dominate short strings — one reset()-recycled instance (and output
  // buffer) per executor thread, the Md5Bits52 pattern
  private val deflaters = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, /* nowrap = */ true)
  }
  private val buffers = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  /** Static kernel shared by interpreted eval and generated code.
    * Returns null (boxed) for empty input. */
  def ratio(s: UTF8String): java.lang.Double = {
    val raw = s.getBytes
    if (raw.length == 0) return null
    val d = deflaters.get()
    d.reset()
    d.setInput(raw)
    d.finish()
    val buf = buffers.get()
    var compressed = 0L
    while (!d.finished()) compressed += d.deflate(buf)
    compressed.toDouble / raw.length
  }
}
