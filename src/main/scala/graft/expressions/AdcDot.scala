package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd ADC (asymmetric distance computation) accumulation — the
  * inner kernel of IVF-PQ scoring ([[graft.similarity.AnnIndex]]): given
  * a candidate's `codes` (array<int>, one codebook code per subspace)
  * and the query's flattened lookup table `lut` (array<double>,
  * `lut[j·codesPerSub + c] = q_j · cent(j, c)`), returns
  *
  *   Σ_j lut[j · codesPerSub + codes[j]]   (= q · x̂)
  *
  * The built-in route — `aggregate(zip_with(codes, sequence(...), ...))`
  * — allocates a sequence array per CANDIDATE ROW and folds through
  * interpreted HigherOrderFunction lambdas; this expression is m array
  * reads + adds in one generated loop inside whole-stage codegen, on the
  * path every pruned candidate of every PQ search pays. A code whose
  * slot falls outside the table (a corrupt index) yields null — the null
  * cosine then sorts out of the top-k window and the row is silently
  * excluded from results, exactly matching the prior non-ANSI
  * `element_at` route's semantics (corruption surfaces as a missing
  * candidate, never a shifted score). Null arrays yield null; null code
  * elements yield null (codes are never null by construction).
  */
case class AdcDot(codes: Expression, lut: Expression, codesPerSub: Expression)
    extends TernaryExpression {

  override def first: Expression = codes
  override def second: Expression = lut
  override def third: Expression = codesPerSub

  override def checkInputDataTypes(): TypeCheckResult = {
    val codesOk = codes.dataType match {
      case ArrayType(IntegerType, _) => true
      case _                         => false
    }
    val lutOk = lut.dataType match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    }
    if (codesOk && lutOk && codesPerSub.dataType == IntegerType &&
        codesPerSub.foldable) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_adc_dot expects (array<int>, array<double>, foldable int), " +
        s"got ${codes.dataType.sql} / ${lut.dataType.sql} / ${codesPerSub.dataType.sql}")
  }

  override def dataType: DataType = DoubleType
  // out-of-range slots and null elements yield null even when the
  // children are non-nullable
  override def nullable: Boolean = true
  override def prettyName: String = "graft_adc_dot"

  override protected def nullSafeEval(c: Any, l: Any, k: Any): Any = {
    val cs = c.asInstanceOf[ArrayData]
    val lt = l.asInstanceOf[ArrayData]
    val per = k.asInstanceOf[Int]
    val m = cs.numElements()
    val slots = lt.numElements()
    var s = 0.0
    var j = 0
    while (j < m) {
      if (cs.isNullAt(j)) return null
      val slot = j * per + cs.getInt(j)
      if (slot < 0 || slot >= slots) return null
      s += lt.getDouble(slot)
      j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l, k) => {
      val m = ctx.freshName("m")
      val slots = ctx.freshName("slots")
      val j = ctx.freshName("j")
      val slot = ctx.freshName("slot")
      val s = ctx.freshName("s")
      val bad = ctx.freshName("bad")
      s"""
         |int $m = $c.numElements();
         |int $slots = $l.numElements();
         |double $s = 0.0;
         |boolean $bad = false;
         |for (int $j = 0; $j < $m && !$bad; $j++) {
         |  if ($c.isNullAt($j)) { $bad = true; } else {
         |    int $slot = $j * $k + $c.getInt($j);
         |    if ($slot < 0 || $slot >= $slots) { $bad = true; }
         |    else { $s += $l.getDouble($slot); }
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $s; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): AdcDot =
    copy(codes = newFirst, lut = newSecond, codesPerSub = newThird)
}
