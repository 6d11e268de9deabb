package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Byte-pair-encoding tokenizer (X44) — the subword primitive every real
 * training pipeline counts with (whitespace tokens over/under-count by
 * 1.3–4× depending on language; sequence packing, token quantiles, and
 * mixing ratios all key off SUBWORD counts).
 *
 * Split of labor at 100 TB:
 *  - **Training** is a bounded-pool driver computation over the DISTRIBUTED
 *    word-frequency table (the corpus shuffles once into word counts; only
 *    the top-`vocabCap` (word, freq) rows — a few thousand tuples — reach
 *    the driver, the same discipline as the IVF/PQ training pools). The
 *    merge loop itself is O(vocab × merges) driver CPU, independent of
 *    corpus size: BPE statistics saturate long before the corpus does.
 *  - **Encoding** is a per-row native expression over the full corpus —
 *    codegen'd, no shuffle, no UDF boundary; the merge table rides the
 *    plan as a reference object (never re-broadcast per row, no literal
 *    blowup — the nearest_centroid move).
 *
 * Determinism contract (what makes the DuckDB oracle replay possible):
 *  - training scans pairs left-to-right and picks the (count max,
 *    lexicographically smallest (a, b)) pair each step;
 *  - encoding repeatedly merges ALL left-to-right non-overlapping
 *    occurrences of the present pair with the LOWEST merge rank;
 *  - words are `trim.toLowerCase.split("\\s+")` — the same normalization
 *    every other text operator here uses.
 */
object BpeOps {

  /** Merge all left-to-right non-overlapping (a, b) adjacencies in `syms`. */
  def mergePair(syms: IndexedSeq[String], a: String, b: String): IndexedSeq[String] = {
    val out = IndexedSeq.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Learn `numMerges` merges from a (word, frequency) vocabulary.
    * Deterministic: input sorted by word; each step takes the pair with the
    * highest total frequency, ties to the lexicographically smallest pair. */
  def train(vocab: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    var words: Vector[(IndexedSeq[String], Long)] = vocab.sortBy(_._1).toVector
      .map { case (w, f) => (w.map(_.toString): IndexedSeq[String], f) }
    val merges = Seq.newBuilder[(String, String)]
    var step = 0
    var exhausted = false
    while (step < numMerges && !exhausted) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          counts.updateWith((syms(i), syms(i + 1)))(c => Some(c.getOrElse(0L) + f))
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val maxC = counts.valuesIterator.max
        val (a, b) = counts.iterator.collect { case (p, c) if c == maxC => p }
          .minBy { case (x, y) => (x, y) }
        merges += ((a, b))
        words = words.map { case (s, f) => (mergePair(s, a, b), f) }
        step += 1
      }
    }
    merges.result()
  }

  /** Rank lookup key — the 0x01 separator never occurs in tokens. */
  @inline private def key(a: String, b: String): String = a + "\u0001" + b

  def rankMap(merges: Seq[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) => m.put(key(a, b), Int.box(i)) }
    m
  }

  /** Encode one word: repeatedly apply the lowest-ranked present merge. */
  def encodeWord(word: String, merges: IndexedSeq[(String, String)],
      ranks: java.util.HashMap[String, Integer]): IndexedSeq[String] = {
    var syms: IndexedSeq[String] = word.map(_.toString)
    var done = syms.length < 2
    while (!done) {
      var best = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.get(key(syms(i), syms(i + 1)))
        if (r != null && (best == -1 || r < best)) best = r
        i += 1
      }
      if (best == -1) done = true
      else {
        val (a, b) = merges(best)
        syms = mergePair(syms, a, b)
        if (syms.length < 2) done = true
      }
    }
    syms
  }
}

/** bpe_encode(text) → array<string>: normalize (trim, lower, split \s+),
  * BPE-encode each word, concatenate the subword streams in order. The
  * merge table is a constructor field carried as a codegen reference object. */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ImplicitCastInputTypes {
  require(merges.nonEmpty, "bpe_encode needs a non-empty merge table")
  override def prettyName: String = "bpe_encode"
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val mergeArr: IndexedSeq[(String, String)] = merges.toIndexedSeq
  @transient private lazy val ranks: java.util.HashMap[String, Integer] = BpeOps.rankMap(merges)
  // per-partition word → encoding memo: corpora repeat words heavily and the
  // merge loop is the hot path; bounded by distinct words seen per task
  @transient private lazy val memo = new java.util.HashMap[String, Array[UTF8String]]()

  /** Row kernel (called from both interpreted eval and generated code). */
  def encodeRow(text: UTF8String): ArrayData = {
    val words = text.toString.trim.toLowerCase.split("\\s+")
    val out = mutable.ArrayBuffer.empty[UTF8String]
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        var toks = memo.get(w)
        if (toks == null) {
          toks = BpeOps.encodeWord(w, mergeArr, ranks)
            .map(UTF8String.fromString).toArray
          if (memo.size < (1 << 20)) memo.put(w, toks)
        }
        out ++= toks
      }
      wi += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override def nullSafeEval(input: Any): Any = encodeRow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncode", this, classOf[BpeEncode].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.encodeRow($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
