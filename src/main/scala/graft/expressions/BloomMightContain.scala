package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built bloom filter of xxhash64 key
  * hashes (public `org.apache.spark.util.sketch.BloomFilter` format).
  *
  * `child` must be the LONG xxhash64 of the join key — the same
  * `functions.xxhash64(key)` the build side inserted. Holding serialized
  * bytes (not the filter object) keeps the expression tree cheap to copy
  * and ship; each task deserializes once via the transient lazy field.
  * Codegen emits a direct `mightContainLong` call on the referenced
  * filter, so the probe stays inside whole-stage codegen next to the scan
  * it is meant to cheapen. */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_might_contain expects the LONG key hash, got ${dt.sql}")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  @transient lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  override protected def nullSafeEval(hash: Any): Any =
    bloom.mightContainLong(hash.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloomExpr", this, classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, h => s"${ev.value} = $ref.bloom().mightContainLong($h);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
