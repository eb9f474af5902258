package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Longest-common-subsequence length of two array<string> token
  * sequences — the kernel under ROUGE-L (Lin 2004) and therefore under
  * self-instruct-style instruction-data dedup, where a candidate is
  * dropped when its ROUGE-L F against an existing instruction is high.
  *
  * Classic O(n·m) dynamic program with two rolling rows (O(min) memory,
  * the longer sequence iterates outermost so the rows stay short), run
  * as ONE static kernel call from whole-stage codegen — per-pair cost is
  * the DP itself, not expression-tree interpretation. Token equality is
  * exact UTF8String equality; callers pick the normalization (the
  * library convention is `split(trim(lower(text)), "\\s+")`) and should
  * bound token counts upstream (`slice`) — instruction data is short,
  * but the DP is quadratic and an unbounded document pair would be a
  * scale bug, which is why the OPERATOR (Dedup.rougeLPairs) truncates,
  * not this expression. Null arrays yield null (BinaryExpression's
  * null-intolerant contract); null elements match nothing. */
case class LcsTokens(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(StringType, _) => true
      case _                        => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_lcs_tokens expects array<string> inputs, " +
        s"got ${left.dataType.sql} / ${right.dataType.sql}")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_lcs_tokens"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    LcsTokens.lcs(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expressions.LcsTokens.lcs($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LcsTokens =
    copy(left = newLeft, right = newRight)
}

object LcsTokens {

  /** Static kernel shared by interpreted eval and generated code. */
  def lcs(a: ArrayData, b: ArrayData): Int = {
    val (longer, shorter) =
      if (a.numElements() >= b.numElements()) (a, b) else (b, a)
    val n = longer.numElements()
    val m = shorter.numElements()
    if (m == 0) return 0
    // materialize the short side once — ArrayData.getUTF8String allocates
    // a wrapper per call on some layouts, and the inner loop reads it n×
    val short = new Array[UTF8String](m)
    var j = 0
    while (j < m) {
      short(j) = if (shorter.isNullAt(j)) null else shorter.getUTF8String(j)
      j += 1
    }
    var prev = new Array[Int](m + 1)
    var curr = new Array[Int](m + 1)
    var i = 0
    while (i < n) {
      val li = if (longer.isNullAt(i)) null else longer.getUTF8String(i)
      j = 0
      while (j < m) {
        val sj = short(j)
        curr(j + 1) =
          if (li != null && sj != null && li.equals(sj)) prev(j) + 1
          else math.max(prev(j + 1), curr(j))
        j += 1
      }
      val t = prev; prev = curr; curr = t
      i += 1
    }
    prev(m)
  }
}
