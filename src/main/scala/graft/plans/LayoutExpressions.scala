package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType}

/**
 * Multi-dimensional layout keys (SURVEY §4: data layout is the optimizer's
 * strongest lever at 100 TB — a predicate can only prune what the writer
 * clustered).
 *
 * `zorder2(a, b)` interleaves the low 31 bits of two non-negative integers
 * into one Morton code: rows close in BOTH dimensions land close in the
 * one-dimensional sort order. Range-partition + sort parquet by this key and
 * every file's min/max footer stats become tight in BOTH columns, so a 2-D
 * box predicate (user range × time range) prunes row groups on both axes —
 * where a single-column sort gives tight stats in that column only and a
 * box query degenerates to a full scan of the other dimension. This is the
 * same technique Delta/Iceberg expose as OPTIMIZE ZORDER BY; here it is a
 * native codegen'd expression feeding plain `repartitionByRange` +
 * `sortWithinPartitions`.
 */
object LayoutOps {

  /** Spread the low 31 bits of x to even bit positions (Morton dilation). */
  def spread(x0: Long): Long = {
    var x = x0 & 0x7FFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton code of (a, b): a in even bits, b in odd. Non-negative output
    * (62 data bits), so plain long ordering is z-curve ordering. Negative
    * inputs clamp to their low 31 bits — callers should pre-normalize. */
  def zorder2(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)
}

/** zorder2(a bigint, b bigint) → bigint Morton code. Declared input types
  * (with implicit casts) so a SQL call over int columns coerces uniformly
  * to bigint in BOTH codegen and interpreted eval — without them codegen
  * silently widened int→long while the interpreted path (constant folding,
  * codegen fallback) threw ClassCastException on the same query. */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "zorder2"
  override def dataType: DataType = LongType
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)

  override def nullSafeEval(a: Any, b: Any): Any =
    LayoutOps.zorder2(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.LayoutOps$$.MODULE$$.zorder2($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

object LayoutFunctions {
  /** Column API (register() via SketchFunctions handles the session). */
  def zorder2(a: Column, b: Column): Column =
    call_function("zorder2", a.cast("bigint"), b.cast("bigint"))
}
