package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.codec.UrlCodec

/** url_normalize(url) → string: FineWeb-shaped URL canonicalization
  * ([[graft.codec.UrlCodec.normalize]]) as a codegen'd per-row expression —
  * scheme/host lowercasing, fragment + default-port + tracking-param strip,
  * path-slash normalization. Total: garbage passes through trimmed. */
case class UrlNormalize(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "url_normalize"
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType

  def normRow(url: UTF8String): UTF8String =
    UTF8String.fromString(UrlCodec.normalize(url.toString))

  override def nullSafeEval(input: Any): Any = normRow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("urlNormalize", this, classOf[UrlNormalize].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.normRow($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** url_host(url) → string: the lowercased host of a URL (after
  * normalization), "" for non-hierarchical inputs. */
case class UrlHost(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "url_host"
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType

  def hostRow(url: UTF8String): UTF8String =
    UTF8String.fromString(UrlCodec.host(url.toString))

  override def nullSafeEval(input: Any): Any = hostRow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("urlHost", this, classOf[UrlHost].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.hostRow($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** url_registered_domain(host, suffixes) → string: one label + the longest
  * matching public suffix ([[graft.codec.UrlCodec.registeredDomain]]). The
  * suffix list is folded from a literal array at resolution into an
  * expression field — the resolved plan carries one reference object, and
  * the SQL oracle replays the same fixture subset. */
case class UrlRegisteredDomain(child: Expression, suffixes: Seq[String])
    extends UnaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "url_registered_domain"
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType

  def domainRow(host: UTF8String): UTF8String =
    UTF8String.fromString(UrlCodec.registeredDomain(host.toString, suffixes))

  override def nullSafeEval(input: Any): Any = domainRow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("urlRegisteredDomain", this,
      classOf[UrlRegisteredDomain].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.domainRow($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** url_resolve(base, ref) → string: RFC 3986 §5.2 relative-reference
  * resolution ([[graft.codec.UrlCodec.resolve]]) as a codegen'd per-row
  * expression — the step between anchor harvest (html_links) and URL
  * hygiene: a crawled page's relative hrefs only become graph edges after
  * resolving against the capture URI. Total; fragments dropped. */
case class UrlResolve(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "url_resolve"
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = StringType

  def resolveRow(base: UTF8String, ref: UTF8String): UTF8String =
    UTF8String.fromString(UrlCodec.resolve(base.toString, ref.toString))

  override def nullSafeEval(base: Any, ref: Any): Any =
    resolveRow(base.asInstanceOf[UTF8String], ref.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("urlResolve", this, classOf[UrlResolve].getName)
    nullSafeCodeGen(ctx, ev, (b, f) => s"${ev.value} = $r.resolveRow($b, $f);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
