package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Byte-level BPE (the GPT-2/tiktoken lineage) — the PRODUCTION tokenizer
 * family next to the code-point families (X44 BPE, X75 WordPiece, X79
 * Unigram): every word first becomes its UTF-8 BYTES, each byte maps
 * through the public 256-entry byte→unicode table, and merges run over
 * those byte symbols. Because the 256 singles are always encodable, there
 * is NO `[unk]` by construction — multilingual text, emoji, and URLs (the
 * content a web corpus is full of, and exactly where code-point
 * tokenizers fall back to `[unk]` and mis-count) tokenize losslessly, and
 * encode∘decode is the identity on any string.
 *
 * The byte→unicode table is public knowledge (the GPT-2 `bytes_to_unicode`
 * construction): the 188 "printable, not space-like" bytes — [33,126],
 * [161,172], [174,255] — map to their own code points; the remaining 68
 * bytes map to 256+n in first-gap order. Every symbol is one BMP char and
 * none is whitespace, so space-joined token streams stay unambiguous.
 *
 * Split of labor at 100 TB mirrors X44: training statistics saturate far
 * below corpus size; encoding is a per-row codegen'd projection with the
 * merge table riding the plan as a reference object — no shuffle, no UDF
 * boundary, no literal blowup.
 */
object ByteBpeOps {

  /** The GPT-2 pre-tokenizer (the public gpt2/tiktoken pattern):
    * contractions, optional-space + letter runs, optional-space + digit
    * runs, optional-space + punctuation runs, then whitespace — with the
    * `\s+(?!\S)` subtlety that a whitespace run BEFORE a word donates its
    * last space to that word (the Ġ space-prefix convention). Case is
    * PRESERVED and every character of the input lands in exactly one
    * pre-token, so concat(preTokenize(s)) == s and encode∘decode is the
    * identity on whole documents, spacing included.
    *
    * Whitespace is the explicit ASCII class [\t\n\f\r ] on BOTH engines:
    * Java's \s and RE2's \s differ at the margins (\x0B), and the DuckDB
    * oracle must replay this split exactly. The oracle replays the
    * lookahead via a chunk transform (see SparkEntry.bytePretokSql): RE2
    * has no lookahead, but splitting the text before the LAST whitespace
    * char of every run that precedes a non-space makes the lookahead-free
    * alternation exact chunk-by-chunk. */
  val PreTokPattern: java.util.regex.Pattern = java.util.regex.Pattern.compile(
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\p{L}\\p{N}\\t\\n\\f\\r ]+" +
      "|[\\t\\n\\f\\r ]+(?![^\\t\\n\\f\\r ])|[\\t\\n\\f\\r ]+")

  /** GPT-2 pre-tokens of `text`, in order, concatenating to `text`. */
  def preTokenize(text: String): IndexedSeq[String] = {
    val m = PreTokPattern.matcher(text)
    val out = IndexedSeq.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }

  /** byte value → mapped unicode symbol (one char), GPT-2 construction. */
  val ByteTable: IndexedSeq[String] = {
    val keep = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    var n = 0
    (0 to 255).map { b =>
      if (keep(b)) b.toChar.toString
      else { val c = (256 + n).toChar.toString; n += 1; c }
    }
  }

  private val symToByte: Map[Char, Int] =
    ByteTable.zipWithIndex.map { case (s, b) => s.charAt(0) -> b }.toMap

  /** A word's UTF-8 bytes as mapped unicode symbols — the pre-merge
    * segmentation every byte-level encoder starts from. */
  def toSymbols(word: String): IndexedSeq[String] =
    word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(b => ByteTable(b & 0xff)).toIndexedSeq

  /** Inverse of [[toSymbols]] over a token stream: map each symbol char
    * back to its byte, decode UTF-8. Total on encoder output (every char
    * of every token came from the table), so encode∘decode = identity. */
  def fromSymbols(tokens: Seq[String]): String = {
    val bytes = mutable.ArrayBuffer.empty[Byte]
    tokens.foreach(_.foreach(ch => bytes += symToByte(ch).toByte))
    new String(bytes.toArray, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Learn `numMerges` merges from a (word, frequency) vocabulary — the
    * [[BpeOps.train]] loop verbatim, the initial segmentation swapped for
    * byte symbols. Deterministic: (count max, lexicographically smallest
    * pair) each step, input sorted by word. */
  def train(vocab: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    var words: Vector[(IndexedSeq[String], Long)] = vocab.sortBy(_._1).toVector
      .map { case (w, f) => (toSymbols(w), f) }
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
        words = words.map { case (s, f) => (BpeOps.mergePair(s, a, b), f) }
        step += 1
      }
    }
    merges.result()
  }

  /** Encode one word over byte symbols: repeatedly apply the lowest-ranked
    * present merge (the [[BpeOps.encodeWord]] loop on the byte plane). */
  def encodeWord(word: String, merges: IndexedSeq[(String, String)],
      ranks: java.util.HashMap[String, Integer]): IndexedSeq[String] = {
    var syms: IndexedSeq[String] = toSymbols(word)
    var done = syms.length < 2
    while (!done) {
      var best = -1
      var i = 0
      while (i < syms.length - 1) {
        // BpeOps.rankMap key format a\u0001b: the separator can never
        // occur inside a byte symbol (byte 0x01 maps to a 256+n char and
        // the keep-ranges start at 33), so the key stays collision-free
        val r = ranks.get(syms(i) + "\u0001" + syms(i + 1))
        if (r != null && (best == -1 || r < best)) best = r
        i += 1
      }
      if (best == -1) done = true
      else {
        val (a, b) = merges(best)
        syms = BpeOps.mergePair(syms, a, b)
        if (syms.length < 2) done = true
      }
    }
    syms
  }
}

/** byte_bpe_encode(text) → array<string>: GPT-2 pre-tokenize (case
  * preserved, leading spaces carried into tokens — the Ġ convention,
  * whitespace runs kept as tokens), byte-level BPE-encode each pre-token,
  * concatenate the streams in order — so decode reconstructs the WHOLE
  * document, spacing and case included, and token counts match what a
  * production byte-level trainer bills. Merge table as a codegen reference
  * object (the BpeEncode discipline); per-partition pre-token memo for the
  * repeated-word hot path. */
case class ByteBpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ImplicitCastInputTypes {
  // an EMPTY merge table is meaningful here (unlike code-point bpe_encode):
  // zero merges = the raw byte-symbol segmentation, the byte family's
  // pre-merge state — the distributed trainer seeds its word plane with it
  override def prettyName: String = "byte_bpe_encode"
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val mergeArr: IndexedSeq[(String, String)] = merges.toIndexedSeq
  @transient private lazy val ranks: java.util.HashMap[String, Integer] = BpeOps.rankMap(merges)
  @transient private lazy val memo = new java.util.HashMap[String, Array[UTF8String]]()

  /** Row kernel (called from both interpreted eval and generated code). */
  def encodeRow(text: UTF8String): ArrayData = {
    val words = ByteBpeOps.preTokenize(text.toString)
    val out = mutable.ArrayBuffer.empty[UTF8String]
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      var toks = memo.get(w)
      if (toks == null) {
        toks = ByteBpeOps.encodeWord(w, mergeArr, ranks)
          .map(UTF8String.fromString).toArray
        if (memo.size < (1 << 20)) memo.put(w, toks)
      }
      out ++= toks
      wi += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override def nullSafeEval(input: Any): Any = encodeRow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("byteBpeEncode", this, classOf[ByteBpeEncode].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.encodeRow($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
