package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * X75: WordPiece subword encoding (Wu et al. 2016; the BERT tokenizer
 * family) as a native codegen'd expression — the second real subword
 * counter next to `bpe_encode`, giving the packing/carving stages a
 * tokenizer whose greedy longest-match-first rule is closed-form and
 * SQL-replayable with the vocab as literals (no training loop at encode
 * time at all).
 *
 * Semantics (exactly what the oracle restates):
 *  - words = split(trim(lower(text)), "\\s+"), empties skipped — the
 *    engine-wide tokenizer contract `bpe_encode` uses;
 *  - per word, walk left to right: at position 0 match the LONGEST vocab
 *    piece without the "##" prefix; at later positions the longest piece
 *    WITH it (emitted prefix included); equal-length candidates are the
 *    same string, so "longest" is unambiguous;
 *  - if no piece matches at any position the WHOLE word becomes "[unk]"
 *    (the standard WordPiece all-or-nothing rule);
 *  - the per-word streams concatenate in document order.
 */
object WordPieceOps {

  final val Unk = "[unk]"

  /** Matching structure: piece sets keyed by (continuation?, length) so a
    * position probe is maxLen hash lookups, not a vocab scan. */
  final class Vocab(pieces: Seq[String]) extends Serializable {
    require(pieces.nonEmpty, "wordpiece vocab is empty")
    val rootSet = new java.util.HashSet[String]()
    val contSet = new java.util.HashSet[String]() // stored WITHOUT the ## prefix
    var maxRoot = 0
    var maxCont = 0
    pieces.foreach { p =>
      require(p.nonEmpty && p != "##", s"bad vocab piece '$p'")
      if (p.startsWith("##")) {
        val body = p.substring(2)
        contSet.add(body)
        if (body.length > maxCont) maxCont = body.length
      } else {
        rootSet.add(p)
        if (p.length > maxRoot) maxRoot = p.length
      }
    }
  }

  /** Greedy longest-match-first encode of one word. */
  def encodeWord(w: String, v: Vocab): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var pos = 0
    while (pos < w.length) {
      val cont = pos > 0
      val set = if (cont) v.contSet else v.rootSet
      val maxL = math.min(if (cont) v.maxCont else v.maxRoot, w.length - pos)
      var l = maxL
      var hit: String = null
      while (l >= 1 && hit == null) {
        val cand = w.substring(pos, pos + l)
        if (set.contains(cand)) hit = cand
        l -= 1
      }
      if (hit == null) return Array(Unk)
      out += (if (cont) "##" + hit else hit)
      pos += hit.length
    }
    out.toArray
  }
}

/** wordpiece_encode(text) → array<string>: normalize (trim, lower, split
  * \s+), WordPiece-encode each word, concatenate the streams. The vocab is
  * a constructor field carried as a codegen reference object. */
case class WordPieceEncode(child: Expression, vocab: Seq[String])
    extends UnaryExpression with ImplicitCastInputTypes {
  require(vocab.nonEmpty, "wordpiece_encode needs a non-empty vocab")
  override def prettyName: String = "wordpiece_encode"
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val v = new WordPieceOps.Vocab(vocab)
  // per-partition word memo — same discipline (and bound) as bpe_encode
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
          toks = WordPieceOps.encodeWord(w, v).map(UTF8String.fromString)
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
    val ref = ctx.addReferenceObj("wordpieceEncode", this,
      classOf[WordPieceEncode].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encodeRow($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
