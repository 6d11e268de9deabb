package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.codec.HtmlCodec

/** html_main_text(html, minChars, maxLinkPct, minStopPct) → string: the
  * jusText-shaped main-content extraction ([[graft.codec.HtmlCodec]]) as a
  * codegen'd expression — block segmentation + per-block classification in
  * one pass per row, thresholds carried as expression fields (folded from
  * literals at resolution). */
case class HtmlMainText(child: Expression, minChars: Int, maxLinkPct: Int,
    minStopPct: Int) extends UnaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "html_main_text"
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType

  def extractRow(html: UTF8String): UTF8String =
    UTF8String.fromString(
      HtmlCodec.mainText(html.toString, minChars, maxLinkPct, minStopPct))

  override def nullSafeEval(input: Any): Any = extractRow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("htmlMainText", this, classOf[HtmlMainText].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.extractRow($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
