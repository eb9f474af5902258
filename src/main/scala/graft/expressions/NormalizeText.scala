package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization of a string column (NFC / NFD / NFKC / NFKD via
  * `java.text.Normalizer` — the JDK's implementation of the published
  * Unicode standard annex #15), with control characters other than
  * tab/newline/carriage-return stripped.
  *
  * The first cleaning step of every text-corpus pipeline: web text mixes
  * precomposed and combining-mark encodings of the same glyphs
  * (`é` as U+00E9 vs `e`+U+0301), fullwidth/compatibility variants, and
  * stray control bytes — all of which break exact dedup hashes, shingle
  * equality, and tokenizer vocabularies for strings a human reads as
  * identical. NFKC is the corpus-curation default (compatibility folding
  * + canonical composition — what the published LLM data pipelines
  * apply); NFC is the lossless variant with a DuckDB twin
  * (`nfc_normalize`), which is what the oracle checks.
  *
  * Stays inside whole-stage codegen (generated call to the static
  * kernel, no UDF boundary); already-normalized ASCII short-circuits via
  * `Normalizer.isNormalized`'s quick check before any allocation. */
case class NormalizeText(child: Expression, form: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if NormalizeText.Forms.contains(form) =>
      TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"graft_normalize form must be one of ${NormalizeText.Forms.mkString("/")}, got '$form'")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_normalize expects a string column, got ${dt.sql}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NormalizeText.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""graft.expressions.NormalizeText.normalize($c, "$form")""")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {

  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  /** Static kernel shared by interpreted eval and generated code. */
  def normalize(s: UTF8String, form: String): UTF8String = {
    val str = s.toString
    val f = java.text.Normalizer.Form.valueOf(form)
    val composed =
      if (java.text.Normalizer.isNormalized(str, f)) str
      else java.text.Normalizer.normalize(str, f)
    // strip control chars except \t \n \r (web text carries stray C0/C1
    // bytes that poison hashes and tokenizers)
    var hasControl = false
    var i = 0
    while (i < composed.length && !hasControl) {
      val c = composed.charAt(i)
      hasControl = c < ' ' && c != '\t' && c != '\n' && c != '\r' || (c >= 0x7f && c <= 0x9f)
      i += 1
    }
    val out =
      if (!hasControl) composed
      else {
        val sb = new java.lang.StringBuilder(composed.length)
        var j = 0
        while (j < composed.length) {
          val c = composed.charAt(j)
          val isControl = c < ' ' && c != '\t' && c != '\n' && c != '\r' || (c >= 0x7f && c <= 0x9f)
          if (!isControl) sb.append(c)
          j += 1
        }
        sb.toString
      }
    if (out.eq(str)) s else UTF8String.fromString(out)
  }
}
