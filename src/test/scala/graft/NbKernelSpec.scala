package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.plans.NbModelRef

/**
 * X72 native NB scoring kernel: nb_argmax / nb_scores must be BIT-identical
 * to the DataFrame formulation (explode → broadcast-join → per-(doc,label)
 * partial sum → 4dp round → smallest-label-tiebreak argmax window) that the
 * SQL oracle states — same formula, same rounding, same tie handling, same
 * code-point tokenizer — because the kernel replaces that plan wholesale in
 * d_lang_id_ngram / d_curate_pipeline_v2 while their oracles stay unchanged.
 */
class NbKernelSpec extends SparkSpec {
  import spark.implicits._

  // mixed scripts, supplementary plane, short docs, empty doc, exact dupes
  private val corpus = Seq(
    (0L, "en", "the quick brown fox jumps over the lazy dog"),
    (1L, "en", "a stitch in time saves nine"),
    (2L, "de", "der schnelle braune fuchs springt"),
    (3L, "de", "ein apfel am tag"),
    (4L, "fr", "le renard brun rapide saute"),
    (5L, "en", "  THE Quick  brown FOX  "),
    (6L, "fr", "bonjour le monde"),
    (7L, "de", "hallo welt wie geht"),
    (8L, "en", "ab"), // < 3 code points after trim → zero trigrams
    (9L, "fr", ""), // empty
    (10L, "en", "emoji 😀 tail and more text here"), // supplementary
    (11L, "de", "der schnelle braune fuchs springt"), // dup of 2
    (12L, "fr", "le chat noir dort sur le tapis rouge"),
    (13L, "en", "rain in spain stays mainly on the plain"),
    (14L, "de", "die katze schlaeft auf dem roten teppich"))

  private def frames() = {
    val docs = corpus.toDF("doc_id", "lang", "text")
      .select(col("doc_id"), col("lang"), lower(trim(col("text"))).as("lc"))
    val tok: Column => Column = c => TextFunctions.charNgramsOf(c, 3)
    val (model, stats) = TextFunctions.naiveBayesTrain(
      docs.where(col("doc_id") % 3 === 0), "lang", textCol = "lc", tokenizer = tok)
    (docs, model, stats, tok)
  }

  test("collectNbModelFused encodes BIT-identically to naiveBayesTrain + collectNbModel") {
    val (docs, model, stats, tok) = frames()
    val slow = TextFunctions.collectNbModel(model, stats)
    val fused = TextFunctions.collectNbModelFused(
      docs.where(col("doc_id") % 3 === 0), "lang", textCol = "lc", tokenizer = tok)
    // the wire encoding carries doubles via Double.toString, so sequence
    // equality (order-insensitively for the vocab body) proves the driver-
    // side smoothing reproduced Spark's expressions exactly, bit for bit
    assert(fused.head == slow.head, "header row (label count)")
    assert(fused.toSet == slow.toSet,
      s"model rows differ: onlyFused=${(fused.toSet -- slow.toSet).take(3)}, " +
        s"onlySlow=${(slow.toSet -- fused.toSet).take(3)}")
  }

  test("nb_argmax equals the DataFrame classify + 4dp-round + argmax window") {
    val (docs, model, stats, tok) = frames()
    val want = {
      val scores = TextFunctions.naiveBayesClassify(
          docs, model, stats, textCol = "lc", tokenizer = tok)
        .withColumn("score", round(col("score"), 4))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("label"))
      scores.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("doc_id"), col("label"), col("score"))
        .collect().map(r => (r.getLong(0), (r.getString(1), r.getDouble(2)))).toMap
    }
    val enc = TextFunctions.collectNbModel(model, stats)
    val got = docs
      .select(col("doc_id"), TextFunctions.nbArgmax(col("lc"), enc).as("p"))
      .select(col("doc_id"), col("p.label"), col("p.score"))
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getDouble(2)))).toMap
    assert(got.keySet == want.keySet)
    got.keySet.toSeq.sorted.foreach { id =>
      assert(got(id) == want(id), s"doc $id: kernel ${got(id)} vs frame ${want(id)}")
    }
  }

  test("nb_scores equals the full per-label score frame in sorted-label order") {
    val (docs, model, stats, tok) = frames()
    val want = TextFunctions.naiveBayesClassify(
        docs, model, stats, textCol = "lc", tokenizer = tok)
      .withColumn("score", round(col("score"), 4))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    val enc = TextFunctions.collectNbModel(model, stats)
    val labels = NbModelRef.decode(enc).labels
    assert(labels.toSeq == labels.toSeq.sorted)
    val got = docs
      .select(col("doc_id"), TextFunctions.nbScores(col("lc"), enc).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    want.keys.map(_._1).toSeq.distinct.foreach { id =>
      labels.zipWithIndex.foreach { case (l, i) =>
        assert(got(id)(i) == want((id, l)), s"doc $id label $l")
      }
    }
  }

  test("zero-trigram docs score exactly round4(logprior) per label") {
    val (docs, model, stats, _) = frames()
    val enc = TextFunctions.collectNbModel(model, stats)
    val m = NbModelRef.decode(enc)
    val got = docs.where(col("doc_id").isin(8L, 9L))
      .select(col("doc_id"), TextFunctions.nbScores(col("lc"), enc).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val want = m.logprior.map(p =>
      java.math.BigDecimal.valueOf(p).setScale(4, java.math.RoundingMode.HALF_UP)
        .doubleValue())
    Seq(8L, 9L).foreach { id =>
      assert(got(id).toArray.toSeq == want.toSeq, s"doc $id")
    }
  }

  test("tie-break picks the lexicographically smallest label") {
    // symmetric two-label model: every score ties → 'aa' must win
    val enc = NbModelRef.encode(
      labels = Seq(("bb", math.log(0.5), math.log(0.25)), ("aa", math.log(0.5), math.log(0.25))),
      rows = Seq(("xyz", "aa", math.log(0.5)), ("xyz", "bb", math.log(0.5))))
    val got = Seq((1L, "xyzxyz"), (2L, "qqq")).toDF("id", "lc")
      .select(col("id"), TextFunctions.nbArgmax(col("lc"), enc).as("p"))
      .select(col("id"), col("p.label")).as[(Long, String)].collect().toMap
    assert(got(1L) == "aa" && got(2L) == "aa")
  }

  test("model encode/decode round-trips doubles bit-exactly; digest is order-independent") {
    val labels = Seq(("en", -0.1234567890123, -7.77), ("de", math.log(1.0 / 3), -8.1e-5))
    val rows = Seq(("abc", "en", -1.5), ("abc", "de", -2.5), ("xyz", "en", -0.25))
    val a = NbModelRef.decode(NbModelRef.encode(labels, rows))
    val b = NbModelRef.decode(NbModelRef.encode(labels.reverse, rows.reverse))
    assert(a == b && a.hashCode == b.hashCode)
    assert(a.labels.toSeq == Seq("de", "en"))
    assert(a.logprior(1) == -0.1234567890123)
    assert(a.tokenLogp.get("abc").toSeq == Seq(-2.5, -1.5))
    assert(a.tokenLogp.get("xyz")(0).isNaN && a.tokenLogp.get("xyz")(1) == -0.25)
  }

  test("supplementary code points tokenize like Spark substr (code-point slices)") {
    val (_, model, stats, _) = frames()
    val enc = TextFunctions.collectNbModel(model, stats)
    // engine-side trigram count must match charNgramsOf's sequence length
    val s = "a😀béc" // 5 code points, 6 UTF-16 units
    val sparkGrams = Seq(s).toDF("lc")
      .select(TextFunctions.charNgramsOf(col("lc"), 3).as("g"))
      .collect().head.getSeq[String](0)
    assert(sparkGrams.length == 3)
    // kernel scores without error and with n_toks = 3 (reflected through a
    // degenerate model where nothing matches: score = prior + 3·logdefault)
    val m = NbModelRef.decode(enc)
    val got = Seq(s).toDF("lc")
      .select(TextFunctions.nbScores(col("lc"), enc).as("sc"))
      .collect().head.getSeq[Double](0)
    m.labels.indices.foreach { i =>
      val want = java.math.BigDecimal.valueOf(
        m.logprior(i) + 3L * m.logdefault(i))
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
      assert(got(i) == want, s"label ${m.labels(i)}")
    }
  }
}
