package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-set token-hit counts in ONE pass over a token array: element i of
  * the output is the number of tokens that belong to `sets(i)`.
  *
  * Built for stopword-based language scoring: the expression-composition
  * route was one `regexp_replace` full-text pass per stopword (~26 scans of
  * every byte per row across 4 languages + quality); here the text is
  * tokenized once upstream and each token does `sets.length` hash-set
  * probes. Input array<string>, output array<long> of length sets.length.
  */
case class TokenSetCounts(child: Expression, sets: Seq[Seq[String]])
    extends UnaryExpression with CodegenFallback {

  require(sets.nonEmpty, "TokenSetCounts needs at least one token set")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"expects array<string>, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_token_set_counts"

  @transient private lazy val probes: Array[java.util.HashSet[UTF8String]] =
    sets.map { words =>
      val s = new java.util.HashSet[UTF8String](words.size * 2)
      words.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Long](probes.length)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val tok = arr.getUTF8String(i)
        var s = 0
        while (s < probes.length) {
          if (probes(s).contains(tok)) counts(s) += 1
          s += 1
        }
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override protected def withNewChildInternal(newChild: Expression): TokenSetCounts =
    copy(child = newChild)
}
