package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * X79: Unigram-LM subword encoding (Kudo 2018; the SentencePiece unigram
 * model) as a native codegen'd expression — the THIRD tokenizer family
 * next to X44 BPE (merge-driven) and X75 WordPiece (greedy longest-match):
 * Viterbi segmentation that picks the GLOBALLY optimal piece sequence for
 * each word, which greedy tokenizers cannot do.
 *
 * Determinism discipline: piece scores are INTEGER COSTS (a -log p grid
 * fixed at seed-definition time), so the DP is exact integer arithmetic —
 * no float summation-order hazard between the engine and the DuckDB
 * oracle. Ties are pinned structurally: each DP candidate's key is
 * `cost*64 + (64 - pieceLen)`, so minimizing the key minimizes cost first
 * and breaks exact-cost ties toward the LONGEST final piece; keys are
 * unique per candidate length, so "min key" is total. The oracle replays
 * the identical key arithmetic (see the d_unigram_encode SQL).
 *
 * Semantics (exactly what the oracle restates):
 *  - words = split(trim(lower(text)), "\\s+"), empties skipped — the
 *    engine-wide tokenizer contract;
 *  - per word, best(j) = min over piece p ending at j of
 *    best(j - len(p)) + cost(p); a position no piece reaches carries the
 *    INF sentinel (100000 — far above any real word's cost, and bounded:
 *    40 chars of chained INF stays far under 2^31/64);
 *  - best(n) >= INF means the word cannot be segmented: the WHOLE word
 *    becomes "[unk]" (the all-or-nothing rule WordPiece also uses);
 *  - the per-word streams concatenate in document order.
 */
object UnigramOps {

  final val Unk = "[unk]"
  final val Inf = 100000

  /** Piece table: cost lookup + max piece length. Pieces arrive encoded
    * as piece + U+0001 + cost (the typedlit wire format the bpe_encode merge
    * table also uses). */
  final class Vocab(encoded: Seq[String]) extends Serializable {
    require(encoded.nonEmpty, "unigram vocab is empty")
    val costs = new java.util.HashMap[String, Integer]()
    var maxLen = 0
    encoded.foreach { s =>
      val cut = s.indexOf('\u0001')
      require(cut > 0, s"bad unigram vocab entry '$s' (want piece\\u0001cost)")
      val piece = s.substring(0, cut)
      val cost = s.substring(cut + 1).toInt
      require(cost > 0 && cost < Inf, s"unigram cost out of range for '$piece'")
      require(piece.length < 64, s"unigram piece too long: '$piece'")
      costs.put(piece, cost)
      if (piece.length > maxLen) maxLen = piece.length
    }
  }

  /** Exact integer Viterbi over one word. */
  def encodeWord(w: String, v: Vocab): Array[String] = {
    val n = w.length
    val cost = new Array[Int](n + 1)
    val choice = new Array[Int](n + 1)
    var j = 1
    while (j <= n) {
      var bestKey = Int.MaxValue
      val maxL = math.min(v.maxLen, j)
      var l = 1
      while (l <= maxL) {
        val pc = v.costs.get(w.substring(j - l, j))
        val c = cost(j - l) + (if (pc == null) Inf else pc.intValue())
        val key = c * 64 + (64 - l)
        if (key < bestKey) bestKey = key
        l += 1
      }
      cost(j) = bestKey / 64
      choice(j) = 64 - bestKey % 64
      j += 1
    }
    if (cost(n) >= Inf) return Array(Unk)
    var p = n
    var out = List.empty[String]
    while (p > 0) {
      val l = choice(p)
      out = w.substring(p - l, p) :: out
      p -= l
    }
    out.toArray
  }
}

/** unigram_encode(text) → array<string>: normalize (trim, lower, split
  * \s+), Viterbi-encode each word under the integer-cost piece table,
  * concatenate the streams. The vocab rides as a codegen reference object;
  * per-partition word memo (the bpe_encode/wordpiece_encode bound). */
case class UnigramEncode(child: Expression, vocab: Seq[String])
    extends UnaryExpression with ImplicitCastInputTypes {
  require(vocab.nonEmpty, "unigram_encode needs a non-empty vocab")
  override def prettyName: String = "unigram_encode"
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val v = new UnigramOps.Vocab(vocab)
  @transient private lazy val memo = new java.util.HashMap[String, Array[UTF8String]]()

  def encodeRow(text: UTF8String): ArrayData = {
    val words = text.toString.trim.toLowerCase.split("\\s+")
    val out = mutable.ArrayBuffer.empty[UTF8String]
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        var toks = memo.get(w)
        if (toks == null) {
          toks = UnigramOps.encodeWord(w, v).map(UTF8String.fromString)
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
    val ref = ctx.addReferenceObj("unigramEncode", this,
      classOf[UnigramEncode].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encodeRow($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
