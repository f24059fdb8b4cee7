package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `parse_page(html)`: the one-pass Wikipedia-page parse (categories,
  * lastmod text, extracted text, word count) as a NATIVE expression
  * returning a struct — the evolution of the `parsePageUdf` ScalaUDF
  * (round-3's q41 hot path).
  *
  * Why native instead of the UDF: a ScalaUDF pays CatalystTypeConverters
  * both ways on every call — the html UTF8String decodes to String (still
  * needed here; the regex engine wants java.lang.String), but the RESULT
  * round-trips Seq[String]/case-class → Row → InternalRow through
  * reflective converters, which profiled at ~4× the actual parse cost.
  * This expression builds the InternalRow directly in the kernel
  * ([[graft.wiki.Html.parsePageRow]]) and the generated code calls the
  * static forwarder — no converter layer, no extra `split(html, ' ')`
  * pass for the word count, and the projection stays inside the
  * whole-stage span.
  *
  * Semantics are IDENTICAL to projecting the four ops separately:
  * categories = extractCategories, lastmod_text = extractLastmodText
  * (null when absent), text = extractText, word_count =
  * size(split(html, ' ')) — each documented against the reference in
  * [[graft.wiki.Html]] (categorizer.py:89-141, converter.py:35-44).
  */
case class ParsePageExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"parse_page expects string, got ${t.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("categories", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("lastmodText", StringType, nullable = true),
    StructField("text", StringType, nullable = false),
    StructField("word_count", IntegerType, nullable = false)))

  override def prettyName: String = "parse_page"

  override protected def nullSafeEval(a: Any): Any =
    graft.wiki.Html.parsePageRow(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.wiki.Html.parsePageRow($s);")

  override protected def withNewChildInternal(newChild: Expression): ParsePageExpr =
    copy(child = newChild)
}
