package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * ngram_explode(text, n) → rows (pos int, gram string) — the UDTF third of
 * the §2.8 surface (UDF = the native scalar expressions, UDAF =
 * `bottom_k_md5`, UDTF = this).
 *
 * Same tokenization/gram semantics as `word_ngrams` (SketchOps: lower, trim,
 * \s+ split, space-joined n-grams; fewer than n tokens → no rows), but
 * STREAMED as a lazy Generator instead of materialized as a per-row array.
 * `explode(word_ngrams(text, n))` builds the whole gram array (one allocation
 * per gram plus the array container, copied into an UnsafeRow) before the
 * Generate unrolls it; on a long web document that array is the row's text
 * re-materialized ~n times over. This generator hands Generate an iterator —
 * tokens split once, each gram string built on demand and released after its
 * output row is projected, so peak memory per row is O(tokens + one gram)
 * regardless of document length. The `pos` ordinal is the word offset, which
 * is what span-level consumers (X36 positional dedup) key on.
 */
case class NgramExplode(child: Expression, n: Int)
  extends UnaryExpression with Generator with CodegenFallback {

  require(n > 0, s"n must be positive, got $n")

  override def prettyName: String = "ngram_explode"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ngram_explode needs a string input, got ${child.dataType.catalogString}")

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("gram", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val text = child.eval(input)
    if (text == null) Iterator.empty
    else {
      val toks = SketchOps.tokensOf(text.asInstanceOf[UTF8String])
      if (toks.length < n) Iterator.empty
      else Iterator.tabulate(toks.length - n + 1) { i =>
        val row = new GenericInternalRow(2)
        row.setInt(0, i)
        row.update(1, UTF8String.fromString(SketchOps.gramAt(toks, i, n)))
        row
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NgramExplode =
    copy(child = newChild)
}
