package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * X59: dictionary keyword tagging — multi-pattern substring search with a
 * classic Aho–Corasick automaton (Aho & Corasick, CACM 1975). The pipeline
 * shapes this serves: topic/domain tagging against a controlled vocabulary,
 * blocklist screening, PII keyword pre-filters, eval-set canary phrases —
 * anywhere a corpus is scanned for a FIXED dictionary of terms.
 *
 * Why an automaton and not `terms.map(contains)`: a contains-per-term plan
 * re-scans every row once PER TERM — O(|text| × |dict|) — and at real
 * dictionary sizes (thousands of blocklist phrases) that multiplies the
 * corpus scan cost by the dictionary size. Aho–Corasick matches ALL terms
 * in ONE left-to-right pass over the text — O(|text| + hits) per row after
 * an O(Σ|term|) one-time build — so the dictionary size disappears from
 * the per-row cost entirely. The automaton rides the plan as a codegen
 * reference object (the nearest_centroid / bpe_encode move): built lazily
 * once per task, never re-broadcast per row, no literal blowup.
 *
 * Semantics (what the SQL oracle replays with per-term `contains`): text
 * lowercased; a term matches if it occurs ANYWHERE as a substring; output
 * is the SORTED DISTINCT matched terms. Overlapping and nested matches all
 * report ("agg" inside "aggregate", "he" inside "she") — standard AC,
 * equality with contains is exact.
 */
object AhoCorasick {

  /** Immutable automaton over lowercase terms. Goto transitions live in
    * per-node hash maps (the alphabet is unbounded unicode); fail links and
    * output sets are resolved at build with the standard BFS, with each
    * node's output set unioned into its children via the fail chain. */
  final class Automaton(val terms: Array[String]) extends Serializable {
    require(terms.nonEmpty, "keyword dictionary is empty")
    require(terms.forall(_.nonEmpty), "keyword dictionary contains an empty term")

    private val goto_ = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
    private val fail = mutable.ArrayBuffer(0)
    // term indices ending at each node (own + inherited via fail links)
    private val out = mutable.ArrayBuffer(Set.empty[Int])

    locally {
      terms.zipWithIndex.foreach { case (t, ti) =>
        var node = 0
        t.foreach { ch =>
          node = goto_(node).getOrElseUpdate(ch, {
            goto_ += mutable.HashMap.empty[Char, Int]
            fail += 0
            out += Set.empty[Int]
            goto_.length - 1
          })
        }
        out(node) = out(node) + ti
      }
      val queue = mutable.Queue.empty[Int]
      goto_(0).values.foreach { c => fail(c) = 0; queue += c }
      while (queue.nonEmpty) {
        val u = queue.dequeue()
        goto_(u).foreach { case (ch, v) =>
          var f = fail(u)
          while (f != 0 && !goto_(f).contains(ch)) f = fail(f)
          fail(v) = if (f != u && goto_(f).contains(ch)) goto_(f)(ch) else 0
          // a match ending here also ends every fail-suffix match
          out(v) = out(v) ++ out(fail(v))
          queue += v
        }
      }
    }

    /** Sorted distinct indices of terms occurring in `text` (one pass). */
    def matchDistinct(text: String): Array[Int] = {
      val hits = mutable.BitSet.empty
      var node = 0
      var i = 0
      while (i < text.length && hits.size < terms.length) {
        val ch = text.charAt(i)
        while (node != 0 && !goto_(node).contains(ch)) node = fail(node)
        node = goto_(node).getOrElse(ch, 0)
        if (out(node).nonEmpty) hits ++= out(node)
        i += 1
      }
      hits.toArray
    }
  }
}

/** keyword_hits(text, terms) → array<string>: the sorted distinct dictionary
  * terms occurring (as substrings, case-insensitive) in the text. The
  * dictionary is a constructor field carried as a codegen reference object. */
case class KeywordHits(child: Expression, terms: Seq[String])
    extends UnaryExpression with ImplicitCastInputTypes {
  require(terms.nonEmpty, "keyword_hits needs a non-empty dictionary")
  override def prettyName: String = "keyword_hits"
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // normalized, sorted, distinct dictionary: output order == dictionary order
  @transient private lazy val sortedTerms: Array[String] =
    terms.map(_.toLowerCase).distinct.sorted.toArray
  @transient private lazy val auto = new AhoCorasick.Automaton(sortedTerms)
  @transient private lazy val termUtf: Array[UTF8String] =
    sortedTerms.map(UTF8String.fromString)

  /** Row kernel (called from both interpreted eval and generated code). */
  def hitsRow(text: UTF8String): ArrayData = {
    val idx = auto.matchDistinct(text.toString.toLowerCase)
    val outArr = new Array[Any](idx.length)
    var i = 0
    while (i < idx.length) { outArr(i) = termUtf(idx(i)); i += 1 }
    new GenericArrayData(outArr)
  }

  override def nullSafeEval(input: Any): Any = hitsRow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("keywordHits", this, classOf[KeywordHits].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.hitsRow($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
