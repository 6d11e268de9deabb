package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructField, StructType}
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

/** html_links(html) → array<struct<href:string, text:string>>: the anchor
  * harvest ([[graft.codec.HtmlCodec.anchors]]) as a codegen'd expression —
  * one parser pass per row emitting (raw href, entity-decoded collapsed
  * anchor text) in document order, so a downstream posexplode carries the
  * link POSITION for free. X80: the outlink-graph / anchor-text entry stage
  * of web-corpus curation, a per-row scan projection (zero shuffle). */
case class HtmlLinks(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "html_links"
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("href", StringType, nullable = false),
      StructField("text", StringType, nullable = false))),
    containsNull = false)

  def extractRow(html: UTF8String): ArrayData = {
    val as = HtmlCodec.anchors(html.toString)
    new GenericArrayData(as.map(a => InternalRow(
      UTF8String.fromString(a.href), UTF8String.fromString(a.text))).toArray[Any])
  }

  override def nullSafeEval(input: Any): Any = extractRow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("htmlLinks", this, classOf[HtmlLinks].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.extractRow($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
