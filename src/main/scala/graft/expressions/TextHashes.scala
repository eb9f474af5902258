package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native-loop hash kernels for dedup signatures.
  *
  * The expression-composition route (k × `array_min(transform(shingles,
  * xxhash64))` / 64 × `aggregate` bit votes) evaluates interpreted lambdas
  * per (element × hash) — ~100M lambda steps at sf0.1. These expressions do
  * the same arithmetic in tight JVM loops per ROW (CodegenFallback: the
  * per-row call is interpreted, the inner loops are native — the lambda
  * overhead was the cost, not codegen itself).
  */

/** MinHash signature: element k = min over shingles of xxhash64(shingle)
  * seeded with k. Input array<string>, output array<long> of numHashes. */
case class ShingleMinHash(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"expects array<string>, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_shingle_minhash"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        var k = 0
        while (k < numHashes) {
          val h = XxHash64Function.hash(s, StringType, k)
          if (h < mins(k)) mins(k) = h
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleMinHash =
    copy(child = newChild)
}

/** Distinct word k-gram identities as 64-bit hashes, in one native loop:
  * trim → lowercase → split on whitespace runs → per-token xxhash64 → per
  * window a chained combine of the k token hashes. Input string (raw
  * text), output array<long>.
  *
  * This replaces the interpreted `shingles()` string construction
  * (transform + slice + concat_ws per gram — string allocation dominated
  * the gram-based operators' runtime) wherever only the gram IDENTITY
  * matters (joins, distinct counts, Jaccard): any injective-modulo-
  * negligible-collisions mapping gives identical counts. Short-text
  * semantics mirror `shingles()`: a text with fewer than k tokens emits
  * its single partial window. */
case class WordShingleHashes(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1, s"k must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"expects string, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_word_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    // mirror shingles() = split(lower(trim(text)), "\\s+") EXACTLY:
    // Spark's trim strips only ' ' (Java String.trim also strips
    // \t\n\r), and Spark's split uses limit -1 (Java's default limit 0
    // drops trailing empty tokens) — either difference changes the gram
    // count for texts with leading/trailing non-space whitespace and
    // breaks parity with the string path and the DuckDB oracles
    val raw = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    var b = 0
    var e = raw.length
    while (b < e && raw.charAt(b) == ' ') b += 1
    while (e > b && raw.charAt(e - 1) == ' ') e -= 1
    // lowercase through UTF8String so the kernel tracks Spark's lower()
    // EXACTLY — Locale.ROOT here would diverge from lower() for non-ASCII
    // input whenever the JVM default locale has special casing (tr/az 'I')
    val text = org.apache.spark.unsafe.types.UTF8String
      .fromString(raw.substring(b, e)).toLowerCase.toString
    val toks = text.split("\\s+", -1)
    val n = toks.length
    val tokenHash = new Array[Long](n)
    var i = 0
    while (i < n) {
      tokenHash(i) = XxHash64Function.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(toks(i)), StringType, 42L)
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val lastStart = math.max(n - k, 0)
    i = 0
    while (i <= lastStart) {
      var h = 1099511628211L // arbitrary non-zero window seed
      var j = i
      val end = math.min(i + k, n)
      while (j < end) {
        h = XxHash64Function.hash(tokenHash(j), LongType, h)
        j += 1
      }
      seen.add(h)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingleHashes =
    copy(child = newChild)
}

/** 64-bit SimHash: bit i is the sign of Σ over tokens of ±1 votes from the
  * token hash's bit i. Input array<string>, output long. */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"expects array<string>, got ${dt.sql}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}
