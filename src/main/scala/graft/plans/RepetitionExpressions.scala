package graft.plans

import java.math.RoundingMode

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * repetition_signals(text, chunkTokens) → struct(n_tokens, dup_chunk_frac,
 * top_bigram_frac, dup_5gram_frac, keep): the X66 Gopher repetition rules
 * (Rae et al. 2021 Table A1, token-adapted) as ONE native codegen'd kernel.
 *
 * Why a native expression and not the higher-order-function projection this
 * started as: an HOF formulation is only safe while its staged arrays stay
 * in their own Project — a downstream `.where(keep)` lets predicate
 * pushdown inline the WHOLE tree into a Filter condition, where the lambda
 * bodies re-evaluate their subtrees per array element (measured: the X70
 * pipeline's gopher gate re-ran full HTML extraction once per n-gram —
 * ~700 s on one sf0.1 partition). A kernel tokenizes ONCE per call no
 * matter how many times the optimizer clones or relocates the expression;
 * the worst any plan shape can do is evaluate the O(m) kernel a handful of
 * times per row.
 *
 * Semantics are bit-identical to the previous formulation (the
 * d_gopher_quality oracle is unchanged):
 *  - tokens = split(trim(lower(text)), "\\s+") with Spark parity: trim
 *    strips 0x20 only, split keeps leading empties (limit -1);
 *  - chunks = consecutive `chunkTokens`-token groups joined by ' ';
 *  - bigrams / 5-grams = sliding windows joined by ' ';
 *  - fractions rounded like Spark's round(x, 6) (BigDecimal.valueOf +
 *    HALF_UP); keep decided by integer cross-multiplication at the Gopher
 *    thresholds (0.3 / 0.2 / 0.3).
 */
case class RepetitionSignalsExpr(child: Expression, chunkTokens: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
  override def prettyName: String = "repetition_signals"
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("dup_chunk_frac", DoubleType, nullable = false),
    StructField("top_bigram_frac", DoubleType, nullable = false),
    StructField("dup_5gram_frac", DoubleType, nullable = false),
    StructField("keep", BooleanType, nullable = false)))

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, RoundingMode.HALF_UP).doubleValue()

  def statsRow(text: UTF8String): InternalRow = {
    val raw = text.toString
    // Spark trim() parity: strip 0x20 only (NOT Java's <= 0x20)
    var b = 0
    var e = raw.length
    while (b < e && raw.charAt(b) == ' ') b += 1
    while (e > b && raw.charAt(e - 1) == ' ') e -= 1
    // DELIBERATELY default-locale toLowerCase: Spark's own lower() lowers
    // non-ASCII via String.toLowerCase with the default locale (the
    // UTF8String slow path), so this is what ENGINE-INTERNAL parity with
    // the staged-HOF formulation requires — and what the oracle's corpus
    // exercises (the gate compares engine vs DuckDB on the same box).
    // Switching to Locale.ROOT here would diverge from Spark's lower()
    // under a Turkish/Azeri JVM, trading one locale sensitivity for
    // another; the engine-wide tokenizer contract wins.
    val toks = raw.substring(b, e).toLowerCase.split("\\s+", -1)
    val n = toks.length
    // chunks: ceil(n / chunkTokens) groups, joined by ' '
    val tc = (n + chunkTokens - 1) / chunkTokens
    val chunkSet = new java.util.HashSet[String](tc * 2)
    var i = 0
    val sb = new java.lang.StringBuilder
    while (i < tc) {
      sb.setLength(0)
      var j = i * chunkTokens
      val end = math.min(n, j + chunkTokens)
      while (j < end) {
        if (sb.length() > 0) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      chunkSet.add(sb.toString)
      i += 1
    }
    val dc = chunkSet.size
    // top bigram multiplicity
    val m2 = if (n >= 2) n - 1 else 0
    var top2 = 0L
    if (m2 > 0) {
      val counts = new java.util.HashMap[String, Integer](m2 * 2)
      i = 0
      while (i < m2) {
        val g = toks(i) + " " + toks(i + 1)
        val c = counts.merge(g, 1, (a, bb) => a + bb)
        if (c > top2) top2 = c.longValue()
        i += 1
      }
    }
    // duplicate 5-gram fraction
    val t5 = if (n >= 5) n - 4 else 0
    var d5 = 0L
    if (t5 > 0) {
      val seen = new java.util.HashSet[String](t5 * 2)
      i = 0
      while (i < t5) {
        sb.setLength(0)
        var j = i
        while (j < i + 5) {
          if (j > i) sb.append(' ')
          sb.append(toks(j))
          j += 1
        }
        if (seen.add(sb.toString)) d5 += 1
        i += 1
      }
    }
    val keep = (tc - dc) * 10L <= tc * 3L &&
      top2 * 20L <= n * 2L &&
      (t5 - d5) * 10L <= t5 * 3L
    new GenericInternalRow(Array[Any](
      n.toLong,
      round6((tc - dc).toDouble / tc),
      round6(2.0 * top2 / n),
      if (t5 > 0) round6((t5 - d5).toDouble / t5) else 0.0,
      keep))
  }

  override def nullSafeEval(input: Any): Any = statsRow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("repetitionSignals", this,
      classOf[RepetitionSignalsExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.statsRow($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
