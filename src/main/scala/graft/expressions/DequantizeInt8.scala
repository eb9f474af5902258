package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen'd int8 dequantization — the inverse of
  * [[graft.similarity.Similarity.quantizeInt8]]: given
  * struct<codes: array<tinyint>, scale: float>, returns
  * `codes[i] · double(scale)` as array<double>.
  *
  * The built-in route (`transform(codes, c -> c · scale)`) runs an
  * interpreted HigherOrderFunction lambda per ELEMENT per row — and this
  * sits on the scoring path of every QUANTIZED index search, where every
  * pruned candidate dequantizes before the exact-cosine re-rank: a
  * 1M-candidate scan at production dims is ~10⁹ interpreted calls. This
  * expression is one generated loop into a primitive double[] per row.
  *
  * Null codes elements (never produced by the quantizer; a corrupt
  * index) dequantize to 0.0 — identical in effect to the previous
  * formulation, whose null elements were skipped as 0 by the
  * [[ArrayDot]] consumers downstream. A null struct yields null.
  */
case class DequantizeInt8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StructType(fields) if fields.length == 2 &&
        (fields(0).dataType match {
          case ArrayType(ByteType, _) => true
          case _                      => false
        }) && fields(1).dataType == FloatType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      "graft_dequantize_int8 expects struct<array<tinyint>, float>, got " +
        other.sql)
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  // a null codes/scale FIELD yields null even when the struct child is
  // non-nullable — without this the generated `isNull = true` would
  // assign to a literal (the NearestCell precedent)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dequantize_int8"

  override protected def nullSafeEval(input: Any): Any = {
    val row = input.asInstanceOf[InternalRow]
    if (row.isNullAt(0) || row.isNullAt(1)) return null
    val codes = row.getArray(0)
    val scale = row.getFloat(1).toDouble
    val n = codes.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (!codes.isNullAt(i)) out(i) = codes.getByte(i) * scale
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val codes = ctx.freshName("codes")
      val scale = ctx.freshName("scale")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |if ($c.isNullAt(0) || $c.isNullAt(1)) { ${ev.isNull} = true; } else {
         |  org.apache.spark.sql.catalyst.util.ArrayData $codes = $c.getArray(0);
         |  double $scale = (double) $c.getFloat(1);
         |  int $n = $codes.numElements();
         |  double[] $out = new double[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$codes.isNullAt($i)) { $out[$i] = $codes.getByte($i) * $scale; }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): DequantizeInt8 =
    copy(child = newChild)
}
