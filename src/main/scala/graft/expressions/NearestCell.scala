package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd nearest-centroid assignment against a per-row candidate
  * list — the inner kernel of the two-level IVF fit's assignment pass
  * ([[graft.similarity.Similarity]]): given a raw vector `vec`
  * (array<double>), its L2 norm `norm` (double, > 0 upstream), and
  * `cands` = array<struct<cell int, cent array<double>, c2 double>>
  * (the sub-centroids of the row's super-cell, `c2` = ‖cent‖²
  * precomputed), returns the `cell` minimizing the unit-sphere distance
  *
  *   ‖vec/norm − cent‖² = 1 − 2·(vec·cent)/norm + c2
  *
  * i.e. argmin of (c2 − 2·(vec·cent)/norm); ties break toward the
  * smaller cell id (evaluation order is candidate order — callers sort
  * candidates by cell). Null/empty candidates or a null vector yield
  * null. One tight generated loop per row (candidates × dims multiplies)
  * — the higher-order-function formulation would run interpreted lambdas
  * per element, and this sits on the full-corpus assignment path where
  * every row pays it.
  */
case class NearestCell(vec: Expression, norm: Expression, cands: Expression)
    extends TernaryExpression {

  override def first: Expression = vec
  override def second: Expression = norm
  override def third: Expression = cands

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = vec.dataType match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    }
    val normOk = norm.dataType == DoubleType
    val candsOk = cands.dataType match {
      case ArrayType(StructType(fields), _) if fields.length == 3 =>
        fields(0).dataType == IntegerType &&
          (fields(1).dataType match {
            case ArrayType(DoubleType, _) => true
            case _                        => false
          }) &&
          fields(2).dataType == DoubleType
      case _ => false
    }
    if (vecOk && normOk && candsOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_nearest_cell expects (array<double>, double, " +
        "array<struct<int, array<double>, double>>), got " +
        s"${vec.dataType.sql} / ${norm.dataType.sql} / ${cands.dataType.sql}")
  }

  override def dataType: DataType = IntegerType
  // an empty candidate list yields null even when every child is
  // non-nullable — without this the generated `isNull = true` would
  // assign to a literal
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nearest_cell"

  override protected def nullSafeEval(v: Any, n: Any, c: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val nm = n.asInstanceOf[Double]
    val cs = c.asInstanceOf[ArrayData]
    val m = cs.numElements()
    if (m == 0) return null
    var best = Double.PositiveInfinity
    var bestCell: Any = null
    var i = 0
    while (i < m) {
      if (!cs.isNullAt(i)) {
        val row = cs.getStruct(i, 3)
        val cent = row.getArray(1)
        val d = math.min(x.numElements(), cent.numElements())
        var dot = 0.0
        var j = 0
        while (j < d) {
          dot += x.getDouble(j) * cent.getDouble(j)
          j += 1
        }
        val dist = row.getDouble(2) - 2.0 * dot / nm
        if (dist < best) { best = dist; bestCell = row.getInt(0) }
      }
      i += 1
    }
    bestCell
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, n, c) => {
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestCell = ctx.freshName("bestCell")
      val found = ctx.freshName("found")
      val row = ctx.freshName("row")
      val cent = ctx.freshName("cent")
      val dot = ctx.freshName("dot")
      val dist = ctx.freshName("dist")
      s"""
         |int $m = $c.numElements();
         |double $best = Double.POSITIVE_INFINITY;
         |int $bestCell = -1;
         |boolean $found = false;
         |for (int $i = 0; $i < $m; $i++) {
         |  if (!$c.isNullAt($i)) {
         |    org.apache.spark.sql.catalyst.InternalRow $row = $c.getStruct($i, 3);
         |    org.apache.spark.sql.catalyst.util.ArrayData $cent = $row.getArray(1);
         |    int $d = java.lang.Math.min($v.numElements(), $cent.numElements());
         |    double $dot = 0.0;
         |    for (int $j = 0; $j < $d; $j++) {
         |      $dot += $v.getDouble($j) * $cent.getDouble($j);
         |    }
         |    double $dist = $row.getDouble(2) - 2.0 * $dot / $n;
         |    if ($dist < $best) { $best = $dist; $bestCell = $row.getInt(0); $found = true; }
         |  }
         |}
         |if ($found) { ${ev.value} = $bestCell; } else { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): NearestCell =
    copy(vec = newFirst, norm = newSecond, cands = newThird)
}
