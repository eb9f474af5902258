package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All random-hyperplane LSH signatures of a vector in ONE native loop:
  * element t is the `bits`-bit sign signature of the vector under table t's
  * deterministic Rademacher planes (component j of plane (t, b) is the
  * parity of MurmurHash3.productHash((t, b, j)) — identical planes on every
  * executor with zero shipped state).
  *
  * The previous formulation — `tables × bits` separate `ArrayDot(vec,
  * typedlit(plane))` expressions summed by a `when`-chain — generated an
  * enormous projection whose background C2 JIT compilation starved the JVM
  * for ~40 s AFTER the query finished, inflating whichever query ran next
  * (found via the r2 bench-pollution investigation). One expression with an
  * internal loop keeps the generated projection tiny.
  *
  * Input array<double> (cast upstream), output array<long> of length
  * `tables`. Vectors longer than `dim` project on their first `dim`
  * components (the planes have `dim` components); shorter vectors project
  * on their own length. Null elements count as 0.
  */
case class RademacherSignatures(
    child: Expression, tables: Int, bits: Int, dim: Int = 64, tableStart: Int = 0)
    extends UnaryExpression with CodegenFallback {

  require(
    tables >= 1 && bits >= 1 && bits <= 63 && tableStart >= 0,
    s"need tables >= 1, 1 <= bits <= 63, tableStart >= 0; got tables=$tables bits=$bits tableStart=$tableStart")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"expects array<double>, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_rademacher_signatures"

  /** signs(t * bits + b)(j) = ±1 — precomputed once per expression instance
    * (driver constructs it, executors get it with the serialized plan). */
  @transient private lazy val signs: Array[Array[Double]] =
    Array.tabulate(tables * bits) { tb =>
      val t = tableStart + tb / bits
      val b = tb % bits
      Array.tabulate(dim) { j =>
        if ((scala.util.hashing.MurmurHash3.productHash((t, b, j)) & 1) == 1) 1.0 else -1.0
      }
    }

  override protected def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val n = math.min(vec.numElements(), dim)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var b = 0
      while (b < bits) {
        val plane = signs(t * bits + b)
        var proj = 0.0
        var j = 0
        while (j < n) {
          if (!vec.isNullAt(j)) proj += vec.getDouble(j) * plane(j)
          j += 1
        }
        if (proj >= 0) sig |= (1L << b)
        b += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): RademacherSignatures =
    copy(child = newChild)
}
