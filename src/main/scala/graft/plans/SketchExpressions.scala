package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expressions for the dedup-sketch hot path (MinHash, SimHash).
 *
 * The composable form — `transform(seeds, s => array_min(transform(grams,
 * g => xxhash64(g, s))))` — is semantically right but physically wrong at
 * scale: higher-order array functions are interpreted (CodegenFallback), each
 * of the k seeds re-walks (and, unmaterialized, re-computes) the gram array,
 * and every intermediate array is allocated per row. These expressions do the
 * same math in one fused pass with `doGenCode`, so the loop inlines into
 * WholeStageCodegen next to the surrounding projection.
 *
 * Hash-family parity with the composable form is preserved exactly:
 * Spark's `xxhash64(g, i)` chains `hashInt(i, hashUnsafeBytes(g, 42))`, so a
 * MinHash row costs ONE string hash per gram plus k integer hashes — not k
 * string hashes. (At larger k, the Kirsch-Mitzenmacher affine trick
 * `h1 + i*h2` would cut the integer hashing too; not needed at k=64.)
 */
object SketchOps {

  /** k min-hashes over the gram array: min_i over grams of
    * hashInt(i, hashUnsafeBytes(gram, 42)) — bit-for-bit what
    * `array_min(transform(grams, g => xxhash64(g, seed_i)))` computes. */
  def minhashSig(grams: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = grams.numElements()
    var i = 0
    while (i < n) {
      val s = grams.getUTF8String(i)
      val hg = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      var seed = 0
      while (seed < k) {
        val h = XXH64.hashInt(seed, hg)
        if (h < mins(seed)) mins(seed) = h
        seed += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** Band bucket hashes: the k-long signature split into `bands` equal
    * slices, each slice folded through a running xxhash64. Equal slices →
    * equal buckets; that is all LSH banding needs. */
  def bandHashes(sig: ArrayData, bands: Int): ArrayData = {
    val k = sig.numElements()
    val rows = k / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 42L
      var j = b * rows
      val end = j + rows
      while (j < end) { acc = XXH64.hashLong(sig.getLong(j), acc); j += 1 }
      out(b) = acc
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** 64-bit SimHash over token hashes: per bit, majority vote (+1 when
    * hashUnsafeBytes(token, 42) has the bit set, −1 otherwise); sign → bit.
    * Bit-for-bit the composable `aggregate(transform(tokens, xxhash64), ...)`
    * votes, one pass, no per-row array allocation. */
  def simhash64(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val s = tokens.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) != 0L) votes(bit) += 1 else votes(bit) -= 1
        bit += 1
      }
      i += 1
    }
    var fp = 0L
    var bit = 0
    while (bit < 64) {
      if (votes(bit) > 0) fp |= (1L << bit)
      bit += 1
    }
    fp
  }

  private val wsPattern = java.util.regex.Pattern.compile("\\s+")

  /** Tokens of trim(lower(text)) split on \s+ — character-for-character what
    * `split(trim(lower(text)), "\\s+")` computes: UTF8String.toLowerCase
    * (locale-independent), UTF8String.trim (space 0x20 only — NOT Java
    * String.trim), Java regex split with limit -1. */
  private[plans] def tokensOf(text: UTF8String): Array[String] =
    wsPattern.split(text.toLowerCase.trim().toString, -1)

  private[plans] def gramAt(toks: Array[String], i: Int, n: Int): String = {
    val sb = new java.lang.StringBuilder
    var j = 0
    while (j < n) {
      if (j > 0) sb.append(' ')
      sb.append(toks(i + j))
      j += 1
    }
    sb.toString
  }

  /** Word n-grams joined by single spaces — one fused pass replacing the
    * interpreted `transform(sequence(...), i => concat_ws(" ", slice(toks,
    * i+1, n)))` chain (which also recomputes the token split per reference).
    * Fewer than n tokens → empty array, matching `when(size(toks) < n,
    * array())`. */
  def wordNgrams(text: UTF8String, n: Int): ArrayData = {
    val toks = tokensOf(text)
    if (toks.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](toks.length - n + 1)
      var i = 0
      while (i < out.length) {
        out(i) = UTF8String.fromString(gramAt(toks, i, n))
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  private val md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  private[plans] def md5Hex(s: String): String = {
    val d = md5Local.get()
    d.reset()
    val bytes = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = new Array[Char](32)
    var i = 0
    while (i < 16) {
      val b = bytes(i) & 0xFF
      hex(2 * i) = Character.forDigit(b >>> 4, 16)
      hex(2 * i + 1) = Character.forDigit(b & 0xF, 16)
      i += 1
    }
    new String(hex)
  }

  /** Minimum md5 hex over word n-grams (winnowing-style document sketch) —
    * value-identical to `array_min(transform(wordNgrams(text, n), md5))` with
    * the zero-gram fallback `md5(trim(lower(text)))`, but never materializes
    * the gram or hash arrays. */
  def minGramMd5(text: UTF8String, n: Int): UTF8String = {
    val s = text.toLowerCase.trim().toString
    val toks = wsPattern.split(s, -1)
    if (toks.length < n) UTF8String.fromString(md5Hex(s))
    else {
      var best: String = null
      var i = 0
      while (i <= toks.length - n) {
        val h = md5Hex(gramAt(toks, i, n))
        if (best == null || h.compareTo(best) < 0) best = h
        i += 1
      }
      UTF8String.fromString(best)
    }
  }

  /** Fraction of positions where two equal-length long arrays agree — the
    * banded-LSH Jaccard estimate (shared over min length defensively). */
  def agreement(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    if (n == 0) return 0.0
    var eq = 0
    var i = 0
    while (i < n) { if (a.getLong(i) == b.getLong(i)) eq += 1; i += 1 }
    eq.toDouble / n
  }
}

/** minhash_sig(grams array<string>, k) → array<bigint> of length k. */
case class MinHashSignature(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, s"k must be positive, got $k")
  override def prettyName: String = "minhash_sig"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    SketchOps.minhashSig(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SketchOps$$.MODULE$$.minhashSig($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** minhash_bands(sig array<bigint>, bands) → array<bigint> of bucket hashes. */
case class MinHashBandHashes(child: Expression, bands: Int) extends UnaryExpression {
  require(bands > 0, s"bands must be positive, got $bands")
  override def prettyName: String = "minhash_bands"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    SketchOps.bandHashes(input.asInstanceOf[ArrayData], bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SketchOps$$.MODULE$$.bandHashes($c, $bands);")

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** simhash64(tokens array<string>) → bigint fingerprint. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SketchOps.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SketchOps$$.MODULE$$.simhash64($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** word_ngrams(text string, n) → array<string> of space-joined word n-grams. */
case class WordNgramsExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"n must be positive, got $n")
  override def prettyName: String = "word_ngrams"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    SketchOps.wordNgrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SketchOps$$.MODULE$$.wordNgrams($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** min_gram_md5(text string, n) → string: min md5 hex over word n-grams. */
case class MinGramMd5(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"n must be positive, got $n")
  override def prettyName: String = "min_gram_md5"
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    SketchOps.minGramMd5(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SketchOps$$.MODULE$$.minGramMd5($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** sig_agreement(a array<bigint>, b array<bigint>) → double in [0,1]. */
case class SignatureAgreement(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "sig_agreement"
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    SketchOps.agreement(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.SketchOps$$.MODULE$$.agreement($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

object SketchFunctions {

  /** Register the sketch expressions (idempotent, like VectorFunctions). The
    * k/bands parameters ride as foldable literal arguments. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("minhash_sig"))) {
      reg.createOrReplaceTempFunction("minhash_sig",
        exprs => MinHashSignature(exprs(0), foldableInt(exprs(1), "k")), "built-in")
      reg.createOrReplaceTempFunction("minhash_bands",
        exprs => MinHashBandHashes(exprs(0), foldableInt(exprs(1), "bands")), "built-in")
      reg.createOrReplaceTempFunction("simhash64",
        exprs => SimHash64(exprs(0)), "built-in")
      reg.createOrReplaceTempFunction("sig_agreement",
        exprs => SignatureAgreement(exprs(0), exprs(1)), "built-in")
      reg.createOrReplaceTempFunction("word_ngrams",
        exprs => WordNgramsExpr(exprs(0), foldableInt(exprs(1), "n")), "built-in")
      reg.createOrReplaceTempFunction("min_gram_md5",
        exprs => MinGramMd5(exprs(0), foldableInt(exprs(1), "n")), "built-in")
      // AggregateFunction builders are legal here: the analyzer wraps a bare
      // AggregateFunction into Complete-mode AggregateExpression on resolve
      reg.createOrReplaceTempFunction("bottom_k_md5",
        exprs => BottomKMd5(exprs(0), foldableInt(exprs(1), "k")), "built-in")
      reg.createOrReplaceTempFunction("hll_md5",
        exprs => HllMd5(exprs(0), foldableInt(exprs(1), "p")), "built-in")
      reg.createOrReplaceTempFunction("cms_md5",
        exprs => CmsMd5(exprs(0), foldableInt(exprs(1), "d"),
          foldableInt(exprs(2), "w")), "built-in")
      reg.createOrReplaceTempFunction("hist_quantile",
        exprs => HistQuantile(exprs(0), foldableInt(exprs(1), "p100"),
          foldableInt(exprs(2), "width"), foldableInt(exprs(3), "buckets")), "built-in")
      reg.createOrReplaceTempFunction("top_k_by",
        exprs => TopKBy(exprs(0), exprs(1), foldableInt(exprs(2), "k")), "built-in")
      // Generator builders are legal too: ExtractGenerator lifts a Generator
      // in a Project into a Generate node during analysis
      reg.createOrReplaceTempFunction("ngram_explode",
        exprs => NgramExplode(exprs(0), foldableInt(exprs(1), "n")), "built-in")
      reg.createOrReplaceTempFunction("zorder2",
        exprs => ZOrder2(exprs(0), exprs(1)), "built-in")
      // the merge-table literal is consumed at resolution and folded into an
      // expression FIELD (the nearest_centroid move) — the resolved plan
      // carries a reference object, not hundreds of string literals
      reg.createOrReplaceTempFunction("bpe_encode",
        exprs => {
          require(exprs.length == 2,
            s"bpe_encode(text, merges) takes 2 arguments, got ${exprs.length}")
          BpeEncode(exprs(0), foldableMerges(exprs(1)))
        }, "built-in")
      reg.createOrReplaceTempFunction("byte_bpe_encode",
        exprs => {
          require(exprs.length == 2,
            s"byte_bpe_encode(text, merges) takes 2 arguments, got ${exprs.length}")
          ByteBpeEncode(exprs(0), foldableMerges(exprs(1)))
        }, "built-in")
      reg.createOrReplaceTempFunction("normalize_text",
        exprs => NormalizeText(exprs(0)), "built-in")
      reg.createOrReplaceTempFunction("url_normalize",
        exprs => UrlNormalize(exprs(0)), "built-in")
      reg.createOrReplaceTempFunction("repetition_signals",
        exprs => RepetitionSignalsExpr(exprs(0),
          foldableInt(exprs(1), "chunkTokens")), "built-in")
      reg.createOrReplaceTempFunction("url_host",
        exprs => UrlHost(exprs(0)), "built-in")
      reg.createOrReplaceTempFunction("url_resolve",
        exprs => UrlResolve(exprs(0), exprs(1)), "built-in")
      // suffix-list literal folded into an expression field at resolution,
      // same discipline as keyword_hits / bpe_encode
      reg.createOrReplaceTempFunction("url_registered_domain",
        exprs => {
          require(exprs.length == 2,
            s"url_registered_domain(host, suffixes) takes 2 arguments, got ${exprs.length}")
          UrlRegisteredDomain(exprs(0), foldableStrings(exprs(1), "suffixes"))
        }, "built-in")
      reg.createOrReplaceTempFunction("html_main_text",
        exprs => HtmlMainText(exprs(0), foldableInt(exprs(1), "minChars"),
          foldableInt(exprs(2), "maxLinkPct"), foldableInt(exprs(3), "minStopPct")),
        "built-in")
      reg.createOrReplaceTempFunction("html_links",
        exprs => HtmlLinks(exprs(0)), "built-in")
      // vocab literal folded into an expression field at resolution (X75)
      reg.createOrReplaceTempFunction("wordpiece_encode",
        exprs => {
          require(exprs.length == 2,
            s"wordpiece_encode(text, vocab) takes 2 arguments, got ${exprs.length}")
          WordPieceEncode(exprs(0), foldableStrings(exprs(1), "vocab"))
        }, "built-in")
      // integer-cost piece table folded the same way (X79)
      reg.createOrReplaceTempFunction("unigram_encode",
        exprs => {
          require(exprs.length == 2,
            s"unigram_encode(text, vocab) takes 2 arguments, got ${exprs.length}")
          UnigramEncode(exprs(0), foldableStrings(exprs(1), "vocab"))
        }, "built-in")
      // trained NB model folded into ONE reference object at resolution
      // (X72) — the plan never carries the vocab as literals
      reg.createOrReplaceTempFunction("nb_argmax",
        exprs => {
          require(exprs.length == 3,
            s"nb_argmax(text, model, n) takes 3 arguments, got ${exprs.length}")
          NbArgmax(exprs(0), NbModelRef.decode(foldableStrings(exprs(1), "model")),
            foldableInt(exprs(2), "n"))
        }, "built-in")
      reg.createOrReplaceTempFunction("nb_scores",
        exprs => {
          require(exprs.length == 3,
            s"nb_scores(text, model, n) takes 3 arguments, got ${exprs.length}")
          NbScores(exprs(0), NbModelRef.decode(foldableStrings(exprs(1), "model")),
            foldableInt(exprs(2), "n"))
        }, "built-in")
      // same resolution-time fold for the keyword dictionary
      reg.createOrReplaceTempFunction("keyword_hits",
        exprs => {
          require(exprs.length == 2,
            s"keyword_hits(text, terms) takes 2 arguments, got ${exprs.length}")
          KeywordHits(exprs(0), foldableStrings(exprs(1), "terms"))
        }, "built-in")
    }
  }

  private def foldableInt(e: Expression, name: String): Int = {
    require(e.foldable, s"$name must be a literal")
    e.eval().asInstanceOf[Number].intValue()
  }

  /** Fold a literal array<string> into a plain Seq. */
  private[plans] def foldableStrings(e: Expression, name: String): Seq[String] = {
    require(e.foldable, s"$name must be a literal array")
    val arr = e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  /** Fold a literal array<string> of a-SOH-b pair encodings into merges. */
  private[plans] def foldableMerges(e: Expression): Seq[(String, String)] = {
    require(e.foldable, "merges must be a literal array")
    val arr = e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    (0 until arr.numElements()).map { i =>
      val s = arr.getUTF8String(i).toString
      val cut = s.indexOf('\u0001')
      require(cut > 0, s"merge entry '$s' is not a-SOH-b encoded")
      (s.substring(0, cut), s.substring(cut + 1))
    }
  }

  /** Column API (requires register() on the session — the Dedup entry points
    * handle that). */
  def minhash_sig(grams: Column, k: Int): Column =
    call_function("minhash_sig", grams.cast("array<string>"), lit(k))

  def minhash_bands(sig: Column, bands: Int): Column =
    call_function("minhash_bands", sig, lit(bands))

  def simhash64(tokens: Column): Column =
    call_function("simhash64", tokens.cast("array<string>"))

  def sig_agreement(a: Column, b: Column): Column =
    call_function("sig_agreement", a, b)

  def word_ngrams(text: Column, n: Int): Column =
    call_function("word_ngrams", text.cast("string"), lit(n))

  /** Corpus-slice KMV sketch (aggregate): k smallest distinct md5 digests. */
  def bottom_k_md5(value: Column, k: Int): Column =
    call_function("bottom_k_md5", value.cast("string"), lit(k))

  /** HLL distinct-count estimate (aggregate): 2^p registers, 48-bit md5
    * hash, estimate replayable exactly in SQL. */
  def hll_md5(value: Column, p: Int): Column =
    call_function("hll_md5", value.cast("string"), lit(p))

  /** Count–Min frequency sketch (aggregate): d×w counters as a row-major
    * array<long>, bit-exact replayable in SQL. */
  def cms_md5(value: Column, d: Int, w: Int): Column =
    call_function("cms_md5", value.cast("string"), lit(d), lit(w))

  /** Streamed word-ngram generator (UDTF): rows (pos, gram), no gram array. */
  def ngram_explode(text: Column, n: Int): Column =
    call_function("ngram_explode", text.cast("string"), lit(n))

  def min_gram_md5(text: Column, n: Int): Column =
    call_function("min_gram_md5", text.cast("string"), lit(n))

  /** Unicode normalization + encoding repair (CRLF→LF, strict mojibake
    * repair, NFC, control/zero-width scrub), applied to fixpoint. */
  def normalize_text(text: Column): Column =
    call_function("normalize_text", text.cast("string"))

  /** HTML main-content extraction: block segmentation + link-density /
    * length / stopword-density classification, good blocks joined by \n. */
  def html_main_text(html: Column, minChars: Int = 25, maxLinkPct: Int = 33,
      minStopPct: Int = 8): Column =
    call_function("html_main_text", html.cast("string"),
      lit(minChars), lit(maxLinkPct), lit(minStopPct))

  /** Anchor harvest: (raw href, entity-decoded collapsed text) per <a>, in
    * document order (X80). */
  def html_links(html: Column): Column =
    call_function("html_links", html.cast("string"))

  /** URL canonicalization: lowercase scheme/host, fragment + default-port +
    * tracking-param strip, path-slash normalization. Total on garbage. */
  def url_normalize(url: Column): Column =
    call_function("url_normalize", url.cast("string"))

  /** Lowercased host of a URL ("" when not hierarchical). */
  def url_host(url: Column): Column =
    call_function("url_host", url.cast("string"))

  /** RFC 3986 §5.2 relative-reference resolution against a base URL (X85). */
  def url_resolve(base: Column, ref: Column): Column =
    call_function("url_resolve", base.cast("string"), ref.cast("string"))

  /** Registered domain: one label + the longest matching suffix from the
    * fixture public-suffix subset (PSL last-label default otherwise). */
  def url_registered_domain(host: Column, suffixes: Seq[String]): Column =
    call_function("url_registered_domain", host.cast("string"),
      lit(suffixes.toArray))
}
