package graft.plans

import java.math.RoundingMode

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * X72: Naive Bayes scoring as a native codegen'd scan projection.
 *
 * Why: the DataFrame classifier (X45/X69, `TextFunctions.naiveBayesClassify`)
 * explodes every token, joins the broadcast model, and partial-sums per
 * (doc, label) — map-side combine bounds the exchange to |docs|×|labels|
 * rows, but that is still a FULL-CORPUS shuffle (plus a second tokenizer
 * pass for n_toks, plus the argmax window) for what is semantically a
 * per-row scoring function with a vocab-bounded model. Measured at r13:
 * `d_lang_id_ngram` 4.0 s at sf0.1 / 34.6 s at sf1 — the slowest row in
 * both artifacts. At 100 TB a language-ID gate must live IN the scan.
 *
 * The fix is the `keyword_hits`/`bpe_encode` discipline: the trained
 * (model, stats) ride the plan as ONE reference object ([[NbModelRef]],
 * digest-equality so Catalyst canonicalization never walks the vocab),
 * the char-n-gram tokenizer runs ONCE per row inside the kernel, and the
 * whole classify is a zero-shuffle projection that survives any plan
 * shape (the X66 lesson: predicate pushdown may clone this into a Filter;
 * a kernel re-runs O(|text|), never O(|text|²)).
 *
 * Semantics are bit-identical to the DataFrame formulation the SQL oracle
 * states (same closed-form smoothing done at TRAIN time, which stays a
 * DataFrame job — only the vocab-bounded result is collected):
 *   score(doc, l) = logprior(l) + Σ_matched logp(tok, l)
 *                   + (n_toks − n_matched(l)) · logdefault(l)
 * tokens = all code-point n-grams of the input (the input column is the
 * caller-staged `lower(trim(text))`, exactly what `charNgramsOf` slices;
 * code-point indexing matches Spark's `substr`/`length` semantics), scores
 * rounded like Spark's round(x, 4) (BigDecimal.valueOf + HALF_UP) BEFORE
 * the argmax, ties break to the lexicographically smallest label.
 */
object NbModelRef {

  private val SepC: Char = '\u0001'
  private[plans] val Sep: String = SepC.toString

  /** Wire encoding of a trained model as one array<string> literal (folded
    * back into a reference object at function resolution — the plan never
    * carries the vocab as literals). Doubles ride as `Double.toString`,
    * which round-trips bit-exactly through `parseDouble`. */
  def encode(labels: Seq[(String, Double, Double)],
      rows: Seq[(String, String, Double)]): Seq[String] = {
    val sorted = labels.sortBy(_._1)
    val idx = sorted.map(_._1).zipWithIndex.toMap
    val head = sorted.map { case (l, p, d) => s"$l" + Sep + p + Sep + d }
    val body = rows.map { case (tok, l, lp) =>
      s"${idx(l)}" + Sep + lp + Sep + tok
    }
    ("NB1" + Sep + sorted.length) +: (head ++ body)
  }

  def decode(enc: Seq[String]): NbModelRef = {
    require(enc.nonEmpty && enc.head.startsWith("NB1\u0001"),
      "nb model encoding missing NB1 header")
    val nLabels = enc.head.split(SepC)(1).toInt
    val labels = new Array[String](nLabels)
    val logprior = new Array[Double](nLabels)
    val logdefault = new Array[Double](nLabels)
    var i = 0
    while (i < nLabels) {
      val parts = enc(1 + i).split(SepC)
      labels(i) = parts(0)
      logprior(i) = java.lang.Double.parseDouble(parts(1))
      logdefault(i) = java.lang.Double.parseDouble(parts(2))
      i += 1
    }
    val rows = new Array[(String, Int, Double)](enc.length - 1 - nLabels)
    i = 0
    while (i < rows.length) {
      val s = enc(1 + nLabels + i)
      val c1 = s.indexOf(SepC)
      val c2 = s.indexOf(SepC, c1 + 1)
      rows(i) = (s.substring(c2 + 1), s.substring(0, c1).toInt,
        java.lang.Double.parseDouble(s.substring(c1 + 1, c2)))
      i += 1
    }
    new NbModelRef(labels, logprior, logdefault, rows)
  }
}

/** Trained NB model as a plan reference object. Labels sorted ascending.
  * Equality/hashCode delegate to a content digest computed once, so
  * expression canonicalization stays O(1) regardless of vocab size. The
  * token map is transient and rebuilt lazily per executor JVM. */
final class NbModelRef(
    val labels: Array[String],
    val logprior: Array[Double],
    val logdefault: Array[Double],
    private val rows: Array[(String, Int, Double)]) extends Serializable {
  require(labels.length > 0, "nb model has no labels")

  val digest: String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def upd(s: String): Unit = md.update(s.getBytes("UTF-8"))
    labels.indices.foreach { i =>
      upd(s"${labels(i)}|${logprior(i)}|${logdefault(i)};")
    }
    // row order is the training frame's nondeterministic collect order —
    // fold with an order-independent combine so equal models digest equal
    var acc = 0L
    rows.foreach { case (tok, li, lp) =>
      val h = java.util.Arrays.hashCode(
        (s"$tok" + NbModelRef.Sep + li + NbModelRef.Sep + lp).getBytes("UTF-8"))
      acc += h.toLong * 0x9e3779b97f4a7c15L
    }
    upd(acc.toString)
    md.digest().map("%02x".format(_)).mkString
  }

  override def equals(o: Any): Boolean = o match {
    case m: NbModelRef => m.digest == digest
    case _ => false
  }
  override def hashCode(): Int = digest.hashCode
  override def toString: String =
    s"NbModelRef(${labels.length} labels, ${rows.length} rows, $digest)"

  /** token → dense per-label logp (NaN = this (token, label) pair absent
    * from the trained model, i.e. unmatched → logdefault). */
  @transient lazy val tokenLogp: java.util.HashMap[String, Array[Double]] = {
    val m = new java.util.HashMap[String, Array[Double]](rows.length * 2)
    rows.foreach { case (tok, li, lp) =>
      var a = m.get(tok)
      if (a == null) {
        a = Array.fill(labels.length)(Double.NaN)
        m.put(tok, a)
      }
      a(li) = lp
    }
    m
  }
}

/** Shared row kernel: tokenize once (code-point n-grams of the staged
  * normalized input), accumulate matched logp + match counts per label,
  * close the score formula, round 4dp. Returns the rounded score vector. */
private[plans] object NbKernel {

  def round4(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(4, RoundingMode.HALF_UP).doubleValue()

  def scores(text: UTF8String, model: NbModelRef, n: Int): Array[Double] = {
    val s = text.toString
    val len = s.length
    val nLabels = model.labels.length
    val sMatched = new Array[Double](nLabels)
    val nMatched = new Array[Long](nLabels)
    // code-point start offsets (Spark length/substr count code points)
    var cpCount = 0
    var i = 0
    while (i < len) { i += Character.charCount(s.codePointAt(i)); cpCount += 1 }
    var nToks = 0L
    if (cpCount >= n) {
      nToks = (cpCount - n + 1).toLong
      val starts = new Array[Int](cpCount + 1)
      i = 0
      var c = 0
      while (i < len) {
        starts(c) = i
        i += Character.charCount(s.codePointAt(i))
        c += 1
      }
      starts(c) = len
      val map = model.tokenLogp
      var t = 0
      while (t < cpCount - n + 1) {
        val a = map.get(s.substring(starts(t), starts(t + n)))
        if (a != null) {
          var l = 0
          while (l < nLabels) {
            val lp = a(l)
            if (!java.lang.Double.isNaN(lp)) {
              sMatched(l) += lp
              nMatched(l) += 1
            }
            l += 1
          }
        }
        t += 1
      }
    }
    val out = new Array[Double](nLabels)
    var l = 0
    while (l < nLabels) {
      out(l) = round4(model.logprior(l) + sMatched(l) +
        (nToks - nMatched(l)) * model.logdefault(l))
      l += 1
    }
    out
  }
}

/** nb_argmax(text) → struct<label, score>: winning label (rounded-4dp max,
  * ties → smallest label) and its score. Zero-shuffle scan projection. */
case class NbArgmax(child: Expression, model: NbModelRef, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n > 0, s"ngram size must be positive, got $n")
  override def prettyName: String = "nb_argmax"
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("label", StringType, nullable = false),
    StructField("score", DoubleType, nullable = false)))

  @transient private lazy val labelUtf: Array[UTF8String] =
    model.labels.map(UTF8String.fromString)

  def argmaxRow(text: UTF8String): InternalRow = {
    val sc = NbKernel.scores(text, model, n)
    var best = 0
    var l = 1
    while (l < sc.length) {
      if (sc(l) > sc(best)) best = l
      l += 1
    }
    new GenericInternalRow(Array[Any](labelUtf(best), sc(best)))
  }

  override def nullSafeEval(input: Any): Any = argmaxRow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nbArgmax", this, classOf[NbArgmax].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.argmaxRow($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** nb_scores(text) → array<double>: the full rounded-4dp score vector in
  * sorted-label order (calibration/threshold consumers). */
case class NbScores(child: Expression, model: NbModelRef, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n > 0, s"ngram size must be positive, got $n")
  override def prettyName: String = "nb_scores"
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  def scoresRow(text: UTF8String): GenericArrayData = {
    val sc = NbKernel.scores(text, model, n)
    new GenericArrayData(sc.map(x => x: Any))
  }

  override def nullSafeEval(input: Any): Any = scoresRow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nbScores", this, classOf[NbScores].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.scoresRow($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
