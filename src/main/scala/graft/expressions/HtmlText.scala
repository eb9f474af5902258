package graft.expressions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML → text extraction: the first stage of every web-corpus curation
  * pipeline (raw crawl → document text), as a per-row kernel.
  *
  * Pipeline (deterministic, order matters):
  *   1. drop `<script>/<style>/<noscript>` elements whole and HTML
  *      comments;
  *   2. turn block-level tags (`p div br li ul ol h1-6 tr td th table
  *      section article header footer blockquote pre hr`) into newlines
  *      — paragraph structure survives extraction, which the line-level
  *      dedup/quality operators downstream depend on;
  *   3. strip every remaining tag;
  *   4. decode the common named entities (`&amp; &lt; &gt; &quot;
  *      &apos; &#39; &nbsp;`) and numeric `&#NNN;`/`&#xHH;` references;
  *   5. normalize whitespace: collapse runs of spaces/tabs inside each
  *      line, trim line ends, drop blank lines.
  *
  * Scope: a regex-grade extractor (tag structure is not parsed as a
  * tree). That covers the tag-stripping + layout step of the published
  * pipelines; content-vs-chrome classification (jusText/trafilatura
  * link-density heuristics) composes downstream on the per-LINE output —
  * which is exactly why block tags become newlines here. Per-row kernel,
  * no state across rows, scales as a map pass. */
case class HtmlText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_html_text expects a string column, got ${dt.sql}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_html_text"

  override protected def nullSafeEval(input: Any): Any =
    HtmlText.extract(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HtmlText.extract($c)")

  override protected def withNewChildInternal(newChild: Expression): HtmlText =
    copy(child = newChild)
}

object HtmlText {

  private val DropElems = Pattern.compile(
    "(?is)<(script|style|noscript)\\b[^>]*>.*?</\\1\\s*>")
  private val Comments = Pattern.compile("(?s)<!--.*?-->")
  private val BlockTags = Pattern.compile(
    "(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|section|article|" +
      "header|footer|blockquote|pre|hr)\\b[^>]*/?>")
  private val AnyTag = Pattern.compile("(?s)<[^>]+>")
  private val NumEntity = Pattern.compile("&#(x[0-9a-fA-F]{1,6}|[0-9]{1,7});")
  private val SpaceRuns = Pattern.compile("[\\t ]+")

  private def decodeNumeric(s: String): String = {
    val m = NumEntity.matcher(s)
    if (!m.find()) return s
    val sb = new java.lang.StringBuilder
    var last = 0
    do {
      sb.append(s, last, m.start())
      val body = m.group(1)
      val cp =
        try {
          if (body.charAt(0) == 'x' || body.charAt(0) == 'X')
            Integer.parseInt(body.substring(1), 16)
          else Integer.parseInt(body)
        } catch { case _: NumberFormatException => -1 }
      if (cp >= 0 && Character.isValidCodePoint(cp)) sb.append(Character.toChars(cp))
      else sb.append(m.group(0)) // leave malformed references as-is
      last = m.end()
    } while (m.find())
    sb.append(s, last, s.length)
    sb.toString
  }

  private def decodeEntities(s: String): String =
    // numeric FIRST ("&amp;#65;" has no raw "&#" yet, so an escaped
    // numeric reference stays literal after one decode level — same
    // policy the &amp;-last ordering gives named entities), then the
    // fixed named set with &amp; last ("&amp;lt;" → literal "&lt;")
    decodeNumeric(s)
      .replace("&nbsp;", " ")
      .replace("&quot;", "\"")
      .replace("&apos;", "'")
      .replace("&#39;", "'")
      .replace("&lt;", "<")
      .replace("&gt;", ">")
      .replace("&amp;", "&")

  /** Static kernel shared by interpreted eval and generated code. */
  def extract(html: UTF8String): UTF8String = {
    var s = html.toString
    s = DropElems.matcher(s).replaceAll("")
    s = Comments.matcher(s).replaceAll("")
    s = BlockTags.matcher(s).replaceAll("\n")
    s = AnyTag.matcher(s).replaceAll("")
    s = decodeEntities(s)
    val out = new StringBuilder
    var first = true
    s.split("\n", -1).foreach { line =>
      val t = SpaceRuns.matcher(line).replaceAll(" ").trim
      if (t.nonEmpty) {
        if (!first) out.append('\n')
        out.append(t)
        first = false
      }
    }
    UTF8String.fromString(out.toString)
  }
}
