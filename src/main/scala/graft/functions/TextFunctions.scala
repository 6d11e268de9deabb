package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis primitives for large-scale corpus pipelines: tokenization,
 * n-grams/shingles, quality scoring, language ID, fingerprinting. All are
 * per-row column expressions — no shuffle, linear in the corpus. The n-gram
 * and fingerprint hot paths run the native codegen'd word_ngrams /
 * min_gram_md5 expressions (graft.plans.SketchExpressions) — those call
 * sites need `SketchFunctions.register(spark)` on the session first (the
 * Dedup entry points and SparkEntry's readers do it). The remaining
 * functions are codegen'd built-ins, except the stopword/marker counters,
 * which use `filter(...)` — an interpreted higher-order function, acceptable
 * because it runs once per row over a short token array.
 *
 * These extend the engine beyond the reference's surface (reference has only
 * the scalar functions in SURVEY §2.6); they are the training-data-pipeline
 * additions (SURVEY §7.3 north-star extensions).
 */
object TextFunctions {

  /** Whitespace tokens of trimmed, lowercased text. */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** Token count (whitespace tokenization). */
  def tokenCount(text: Column): Column = size(tokens(text))

  // ------------------------------------------------------------- BPE (X44)

  /** Deterministic seed vocabulary for the FIXED merge table: sf-independent
    * (embedded here, not derived from a fixture), so the DuckDB oracle can
    * replay the exact table as literals at every scale factor. Frequencies
    * shaped like the fixture corpus vocabulary. `BpeSpec` pins
    * `bpeTrain(BpeSeedVocab, 48)` == the table the oracles embed. */
  val BpeSeedVocab: Seq[(String, Long)] = Seq(
    "table" -> 40L, "row" -> 35L, "data" -> 30L, "query" -> 28L, "value" -> 26L,
    "batch" -> 24L, "window" -> 22L, "stream" -> 20L, "filter" -> 18L,
    "merge" -> 16L, "join" -> 15L, "hash" -> 14L, "scan" -> 13L, "sort" -> 12L,
    "spark" -> 11L, "column" -> 10L, "small" -> 9L, "fast" -> 8L, "slow" -> 7L,
    "part" -> 6L, "order" -> 5L, "line" -> 4L, "customer" -> 3L, "agg" -> 2L,
    "big" -> 2L, "key" -> 2L, "the" -> 2L, "a" -> 1L)

  /** The fixed 48-merge table trained from [[BpeSeedVocab]]. */
  lazy val BpeSeedMerges: Seq[(String, String)] =
    graft.plans.BpeOps.train(BpeSeedVocab, 48)

  /** Train a merge table from a corpus, Spark-first: ONE shuffle into the
    * word-frequency table, top-`vocabCap` rows (count desc, word — a
    * deterministic, bounded driver pool, the IVF/PQ discipline) feed the
    * driver-side merge loop. BPE statistics saturate far below corpus size,
    * so the cap costs nothing at 100 TB and bounds driver memory hard. */
  def bpeTrainOn(docs: org.apache.spark.sql.DataFrame, numMerges: Int,
      vocabCap: Int = 4096, textCol: String = "text"): Seq[(String, String)] = {
    val vocab = docs
      .select(explode(tokens(col(textCol))).as("word"))
      .where(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word"))
      .limit(vocabCap)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    graft.plans.BpeOps.train(vocab, numMerges)
  }

  /** X84: the padded two-pass merge rewrite `bpeTrainDistributed` applies —
    * public so the spec can property-test the fixpoint (two passes leave no
    * ' a b ' occurrence; a third pass is a no-op). String semantics: literal
    * non-overlapping left-to-right replace, second pass catching the
    * occurrences whose shared boundary space the first pass consumed —
    * IDENTICAL in java.lang.String.replace and DuckDB replace(), which is
    * the whole point (the oracle replays every training iteration). */
  def mergeSeg(seg: String, pair: String): String = {
    val pat = " " + pair + " "
    val rep = " " + pair.replace(" ", "") + " "
    (" " + seg + " ").replace(pat, rep).replace(pat, rep).trim
  }

  /** X84: DISTRIBUTED BPE merge learning — [[bpeTrainOn]] without the
    * driver vocab cap: at web scale the distinct-word plane can hold 10⁸+
    * rows (beyond any driver pool, and a cap biases the learned merges), so
    * it stays a DataFrame. Each of the `numMerges` iterations counts
    * adjacent symbol pairs with ONE aggregate over the corpus-weighted word
    * plane (map-side partials — the exchange carries distinct pairs, never
    * the corpus) and collects exactly ONE row: the winner by (count DESC,
    * pair ASC). The merge applies as the [[mergeSeg]] padded two-pass
    * replace on the space-joined segmentation, then the plane is
    * localCheckpoint'd so the next iteration's job stays shallow.
    *
    * Semantics note (BpeTrainSpec pins both): pair counts are OVERLAPPING
    * adjacent counts and the rewrite equals BpeOps.train's textbook
    * list-walk everywhere except a run of ≥5 identical symbols inside one
    * word (list-walk merges (1,2)(3,4)…, the string rewrite merges
    * (1,2)(4,5)… — same multiset at run 5, divergent beyond), a shape the
    * whitespace-token corpus cannot produce. The string form is chosen
    * because Spark and DuckDB replace() agree exactly, making the training
    * loop itself SQL-replayable.
    *
    * Returns (merges as (step, "a b", summed count), final word plane
    * (w, cnt, seg)). */
  def bpeTrainDistributed(docs: org.apache.spark.sql.DataFrame, numMerges: Int,
      textCol: String = "text"): (Seq[(Int, String, Long)], org.apache.spark.sql.DataFrame) =
    bpeMergeLoop(
      docs.select(explode(tokens(col(textCol))).as("w"))
        .where(col("w") =!= "")
        .groupBy("w").agg(count(lit(1)).as("cnt"))
        .select(col("w"), col("cnt"),
          trim(regexp_replace(col("w"), "(.)", "$1 ")).as("seg"))
        .localCheckpoint(true),
      numMerges)

  /** X99t: the X84 loop on the BYTE plane — the distributed trainer for
    * the byte-level family: the initial segmentation is the word's UTF-8
    * byte symbols (the 256-entry table; `byte_bpe_encode` with an empty
    * merge list IS that segmentation), everything downstream — pair
    * counting, the (count DESC, pair ASC) winner, the padded two-pass
    * rewrite — is segmentation-agnostic and shared verbatim, so the two
    * trainers cannot drift in loop semantics. */
  def byteBpeTrainDistributed(docs: org.apache.spark.sql.DataFrame, numMerges: Int,
      textCol: String = "text"): (Seq[(Int, String, Long)], org.apache.spark.sql.DataFrame) =
    bpeMergeLoop(
      docs.select(explode(tokens(col(textCol))).as("w"))
        .where(col("w") =!= "")
        .groupBy("w").agg(count(lit(1)).as("cnt"))
        .select(col("w"), col("cnt"),
          array_join(byteBpeSymbols(col("w")), " ").as("seg"))
        .localCheckpoint(true),
      numMerges)

  /** The raw byte-symbol segmentation of a word: `byte_bpe_encode` with
    * ZERO merges (a byte-level encoder's pre-merge state is exactly the
    * mapped byte stream). */
  def byteBpeSymbols(text: Column): Column =
    call_function("byte_bpe_encode", text.cast("string"),
      typedlit(Seq.empty[String]))

  /** The shared X84/X99t merge-learning loop over a corpus-weighted
    * (w, cnt, seg) plane: each of the `numMerges` iterations counts
    * adjacent symbol pairs with ONE aggregate (map-side partials — the
    * exchange carries distinct pairs, never the corpus), collects exactly
    * the winner row, and applies the [[mergeSeg]] padded two-pass replace;
    * the plane localCheckpoints per step so job i stays shallow. */
  private def bpeMergeLoop(words0: org.apache.spark.sql.DataFrame, numMerges: Int)
      : (Seq[(Int, String, Long)], org.apache.spark.sql.DataFrame) = {
    var words = words0
    val merges = Seq.newBuilder[(Int, String, Long)]
    for (step <- 1 to numMerges) {
      val best = words
        .select(col("cnt"), split(col("seg"), " ").as("sym"))
        .select(col("cnt"), explode(expr(
          "zip_with(slice(sym, 1, size(sym) - 1), slice(sym, 2, size(sym) - 1)," +
            " (a, b) -> concat(a, ' ', b))")).as("pair"))
        .groupBy("pair").agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("pair"))
        .limit(1).collect()
      if (best.nonEmpty) {
        val pair = best(0).getString(0)
        merges += ((step, pair, best(0).getLong(1)))
        val pat = lit(" " + pair + " ")
        val rep = lit(" " + pair.replace(" ", "") + " ")
        val padded = concat(lit(" "), col("seg"), lit(" "))
        words = words.withColumn("seg",
          trim(replace(replace(padded, pat, rep), pat, rep)))
          .localCheckpoint(true)
      }
    }
    (merges.result(), words)
  }

  /** X87: DISTRIBUTED WordPiece training — [[bpeTrainDistributed]]'s loop
    * with the BERT objective: each step merges the pair maximizing
    * LIKELIHOOD gain score(a,b) = count(ab) / (count(a)·count(b)) instead
    * of raw pair frequency (Schuster & Nakajima 2012; the "wordpiece"
    * section of the BERT paper). Determinism discipline: the score is the
    * INTEGER floor(count(ab)·10⁹ / (count(a)·count(b))) — a fixed grid
    * both engines compute exactly (ties → pair ASC), no float division.
    * Per step: one symbol-count aggregate + one pair-count aggregate over
    * the distributed word plane (map-side partials), two broadcast-size
    * joins (symbol plane ≤ alphabet+merges), ONE collected row. The merge
    * applies as the same [[mergeSeg]] two-pass replace, so the oracle
    * replays every iteration. Returns (merges as (step, "a b", score,
    * pairCount), final word plane). */
  def wordpieceTrainDistributed(docs: org.apache.spark.sql.DataFrame,
      numMerges: Int, textCol: String = "text")
      : (Seq[(Int, String, Long, Long)], org.apache.spark.sql.DataFrame) = {
    var words = docs
      .select(explode(tokens(col(textCol))).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(col("w"), col("cnt"),
        trim(regexp_replace(col("w"), "(.)", "$1 ")).as("seg"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(Int, String, Long, Long)]
    for (step <- 1 to numMerges) {
      val syms = words
        .select(col("cnt"), explode(split(col("seg"), " ")).as("sym"))
        .groupBy("sym").agg(sum("cnt").as("c"))
      val pairs = words
        .select(col("cnt"), split(col("seg"), " ").as("sym"))
        .select(col("cnt"), explode(expr(
          "zip_with(slice(sym, 1, size(sym) - 1), slice(sym, 2, size(sym) - 1)," +
            " (x, y) -> named_struct('a', x, 'b', y))")).as("pr"))
        .groupBy(col("pr.a").as("a"), col("pr.b").as("b"))
        .agg(sum("cnt").as("cab"))
      val sa = syms.select(col("sym").as("a"), col("c").as("ca"))
      val sb = syms.select(col("sym").as("b"), col("c").as("cb"))
      val best = pairs
        .join(broadcast(sa), "a").join(broadcast(sb), "b")
        .select(concat(col("a"), lit(" "), col("b")).as("pair"),
          expr("(cab * bigint(1000000000)) div (ca * cb)").as("score"),
          col("cab"))
        .orderBy(col("score").desc, col("pair"))
        .limit(1).collect()
      if (best.nonEmpty) {
        val pair = best(0).getString(0)
        merges += ((step, pair, best(0).getLong(1), best(0).getLong(2)))
        val pat = lit(" " + pair + " ")
        val rep = lit(" " + pair.replace(" ", "") + " ")
        val padded = concat(lit(" "), col("seg"), lit(" "))
        words = words.withColumn("seg",
          trim(replace(replace(padded, pat, rep), pat, rep)))
          .localCheckpoint(true)
      }
    }
    (merges.result(), words)
  }

  /** X95: DISTRIBUTED Unigram-LM training — the hard-EM loop completing
    * the trainer triple next to [[bpeTrainDistributed]] (frequency) and
    * [[wordpieceTrainDistributed]] (likelihood gain): seed a piece
    * inventory from corpus substring statistics (the SentencePiece seed
    * stage — every single char, plus the `topMulti` most frequent
    * substrings of length 2..`maxPieceLen` by (count DESC, piece ASC)),
    * then alternate (E) Viterbi-segment the word plane under the current
    * integer costs via the NATIVE X79 kernel and (M) recount piece usage
    * and refresh costs. Determinism discipline: cost(p) = FL2(T) − FL2(c)
    * + 1 on the exact floor-log2 grid (FL2 via bit length — DuckDB
    * replays it as length(bin(x)) − 1, no float log), usage smoothing
    * c ← u + 1 keeps every inventory piece finite, and the DP tie key is
    * X79's cost·64 + (64 − len). Words longer than `maxWordLen` chars are
    * excluded from the training plane (stated — SentencePiece caps its
    * candidate lengths the same way).
    *
    * Shuffle shape for 100 TB: the corpus collapses ONCE into the word
    * plane (bounded by distinct words — Heaps' law), the substring plane
    * is ≤ maxWordLen·maxPieceLen rows per word, the inventory is
    * alphabet + topMulti rows (broadcast as the kernel's reference
    * object), and each E-step is a scan projection over the word plane
    * whose usage aggregate exchanges ≤ |inventory| rows after map-side
    * partials. Two bounded collects per iteration — the X84 discipline.
    *
    * Returns the top-`reportK` final pieces by (n_uses DESC, piece ASC)
    * with the usage count and the cost the final segmentation ran under. */
  def unigramTrainDistributed(docs: org.apache.spark.sql.DataFrame,
      iters: Int = 2, maxPieceLen: Int = 4, maxWordLen: Int = 16,
      topMulti: Int = 64, reportK: Int = 40,
      textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    graft.plans.SketchFunctions.register(spark)
    val words = docs
      .select(explode(tokens(col(textCol))).as("word"))
      .where(col("word") =!= "" && length(col("word")) <= maxWordLen)
      .groupBy("word").agg(count(lit(1)).cast("long").as("cnt"))
      .localCheckpoint(true)
    val tall = words
      .select(col("word"), col("cnt"),
        explode(sequence(lit(1), length(col("word")))).as("i"))
      .select(col("word"), col("cnt"), col("i"),
        explode(sequence(lit(1), least(lit(maxPieceLen), col("i")))).as("l"))
      .select(col("cnt"), expr("substring(word, i - l + 1, l)").as("piece"))
    val sc = tall.groupBy("piece").agg(sum("cnt").as("c"))
    val singles = sc.where(length(col("piece")) === 1)
    val multis = sc.where(length(col("piece")) >= 2)
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("c").desc, col("piece"))))
      .where(col("rn") <= topMulti).drop("rn")
    // inventory: bounded by construction (|alphabet| + topMulti)
    val inv: Array[(String, Long)] = singles.unionByName(multis)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def fl2(x: Long): Int = 63 - java.lang.Long.numberOfLeadingZeros(x)
    def costsOf(counts: Map[String, Long]): Seq[(String, Int)] = {
      val t = counts.values.sum
      inv.toSeq.map { case (p, _) => (p, fl2(t) - fl2(counts(p)) + 1) }
    }
    var counts: Map[String, Long] = inv.toMap
    var vocab: Seq[(String, Int)] = Nil
    var usage: Map[String, Long] = Map.empty
    for (_ <- 1 to iters) {
      vocab = costsOf(counts)
      usage = words
        .select(col("cnt"), explode(unigramEncode(col("word"), vocab)).as("piece"))
        .groupBy("piece").agg(sum("cnt").as("c"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap // ≤ |inv|
      counts = inv.map { case (p, _) => (p, usage.getOrElse(p, 0L) + 1L) }.toMap
    }
    val costOf = vocab.toMap
    val report = inv.toSeq
      .map { case (p, _) => (p, usage.getOrElse(p, 0L), costOf(p).toLong) }
      .sortBy { case (p, u, _) => (-u, p) }
      .take(reportK)
    import spark.implicits._
    report.toDF("piece", "n_uses", "cost")
  }

  /** bpe_encode(text) → array<string> subword stream (native codegen'd
    * expression; merge table rides as a reference object). Requires
    * SketchFunctions.register on the session. */
  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column =
    call_function("bpe_encode", text.cast("string"),
      typedlit(merges.map { case (a, b) => a + "\u0001" + b }))

  /** Subword token count under a merge table. */
  def bpeTokenCount(text: Column, merges: Seq[(String, String)]): Column =
    size(bpeEncode(text, merges))

  // -------------------------------------------------- byte-level BPE (X99)

  /** Deterministic seed vocabulary for the byte-level merge table —
    * sf-independent like [[BpeSeedVocab]], but deliberately carrying the
    * content byte-level tokenizers exist FOR: accented latin (2-byte
    * UTF-8), CJK (3-byte), an emoji (4-byte), and URL-shaped strings. The
    * code-point families [unk] or mis-merge on these; byte-level encodes
    * them losslessly. `ByteBpeSpec` pins
    * `ByteBpeOps.train(ByteBpeSeedVocab, 48)` == the table the oracle
    * embeds. */
  val ByteBpeSeedVocab: Seq[(String, Long)] = Seq(
    "table" -> 40L, "row" -> 35L, "data" -> 30L, "query" -> 28L, "value" -> 26L,
    "batch" -> 24L, "window" -> 22L, "stream" -> 20L, "filter" -> 18L,
    "merge" -> 16L, "join" -> 15L, "hash" -> 14L, "scan" -> 13L, "sort" -> 12L,
    "spark" -> 11L, "column" -> 10L, "café" -> 9L, "über" -> 8L,
    "naïve" -> 7L, "https://example.com/a" -> 6L, "日本語" -> 5L,
    "🙂🙂" -> 4L, "part" -> 6L, "order" -> 5L, "line" -> 4L,
    "customer" -> 3L, "agg" -> 2L, "the" -> 2L, "a" -> 1L)

  /** The fixed 48-merge byte-level table trained from [[ByteBpeSeedVocab]]. */
  lazy val ByteBpeSeedMerges: Seq[(String, String)] =
    graft.plans.ByteBpeOps.train(ByteBpeSeedVocab, 48)

  /** byte_bpe_encode(text) → array<string> byte-symbol subword stream
    * (native codegen'd expression; merge table rides as a reference
    * object). No [unk] by construction — the 256 byte singles always
    * encode. Requires SketchFunctions.register on the session. */
  def byteBpeEncode(text: Column, merges: Seq[(String, String)]): Column =
    call_function("byte_bpe_encode", text.cast("string"),
      typedlit(merges.map { case (a, b) => a + "\u0001" + b }))

  /** Subword token count under a byte-level merge table — the EXACT count
    * the packing/carving budget gates should bill with (whitespace and
    * code-point counts drift on exactly the multilingual/URL content a
    * web corpus is full of). */
  def byteBpeTokenCount(text: Column, merges: Seq[(String, String)]): Column =
    size(byteBpeEncode(text, merges))

  /** X75 fixed seed WordPiece vocab (the [[BpeSeedMerges]] discipline: a
    * FIXED table makes the truth replayable — the oracle carries the same
    * pieces as literals). Singles cover [a-z0-9] so any plain alphanumeric
    * word encodes; words with any other character become "[unk]" whole
    * (the standard all-or-nothing rule). */
  val WordPieceSeedVocab: Seq[String] = {
    val singles = (('a' to 'z') ++ ('0' to '9')).map(_.toString)
    val roots = Seq("the", "and", "for", "with", "that", "th", "wh", "re",
      "de", "con", "pro", "an", "be", "he", "we", "st", "ch", "sh", "tr",
      "qu", "data", "stream", "filter", "merge", "join", "hash", "scan",
      "sort", "batch", "window", "table", "query", "value", "row")
    val conts = Seq("##ing", "##ed", "##er", "##es", "##ly", "##tion",
      "##al", "##ent", "##ous", "##ness", "##th", "##nd", "##st", "##ble",
      "##ow", "##am", "##ery", "##ata")
    singles ++ singles.map("##" + _) ++ roots ++ conts
  }

  /** wordpiece_encode(text) → array<string> subword stream (native
    * codegen'd; vocab rides as a reference object). Requires
    * SketchFunctions.register on the session. */
  def wordpieceEncode(text: Column, vocab: Seq[String] = WordPieceSeedVocab): Column =
    call_function("wordpiece_encode", text.cast("string"), typedlit(vocab))

  /** Subword token count under a WordPiece vocab. */
  def wordpieceTokenCount(text: Column, vocab: Seq[String] = WordPieceSeedVocab): Column =
    size(wordpieceEncode(text, vocab))

  /** X79 fixed seed Unigram-LM piece table as (piece, integer cost) — a
    * -log p grid fixed here so the Viterbi DP is exact integer arithmetic
    * on both engines (no float summation-order hazard). Singles cover
    * [a-z0-9] at cost 10, so any plain alphanumeric word segments (the
    * character fallback every real unigram vocab keeps); multi-char pieces
    * cost less than their letters so the DP genuinely prefers them; any
    * other character makes the whole word "[unk]". */
  val UnigramSeedVocab: Seq[(String, Int)] = {
    val singles = (('a' to 'z') ++ ('0' to '9')).map(_.toString -> 10)
    val multi = Seq("th" -> 13, "the" -> 16, "re" -> 14, "in" -> 14,
      "ing" -> 16, "er" -> 14, "an" -> 14, "and" -> 16, "on" -> 14,
      "ion" -> 16, "tion" -> 19, "at" -> 14, "en" -> 14, "ed" -> 14,
      "es" -> 14, "or" -> 14, "st" -> 14, "data" -> 20, "stream" -> 26,
      "row" -> 17, "table" -> 23, "query" -> 24, "value" -> 23,
      "batch" -> 23, "hash" -> 21, "join" -> 21, "scan" -> 20,
      "sort" -> 20, "filter" -> 25, "merge" -> 23, "window" -> 26)
    singles ++ multi
  }

  /** unigram_encode(text) → array<string> subword stream (native
    * codegen'd Viterbi; the integer-cost piece table rides as a reference
    * object). Requires SketchFunctions.register on the session. */
  def unigramEncode(text: Column,
      vocab: Seq[(String, Int)] = UnigramSeedVocab): Column =
    call_function("unigram_encode", text.cast("string"),
      typedlit(vocab.map { case (p, c) => p + "\u0001" + c }))

  /** Subword token count under a unigram piece table. */
  def unigramTokenCount(text: Column,
      vocab: Seq[(String, Int)] = UnigramSeedVocab): Column =
    size(unigramEncode(text, vocab))

  /** keyword_hits(text, dict) → sorted distinct dictionary terms occurring
    * in the text (case-insensitive substring match) — ONE Aho–Corasick pass
    * per row regardless of dictionary size (X59, native codegen'd; the
    * automaton rides the plan as a reference object). Requires
    * SketchFunctions.register on the session. */
  def keywordHits(text: Column, terms: Seq[String]): Column =
    call_function("keyword_hits", text.cast("string"), typedlit(terms))

  // --------------------------------------------- Naive Bayes classifier (X45)

  /** Train a multinomial Naive Bayes token model — the fastText-style
    * quality/domain/language classifier every curation pipeline keeps
    * around, built Spark-first and fully SQL-replayable (counts + closed-
    * form smoothing, no iterative fitting):
    *  - ONE shuffle into (label, token) counts (map-side combined);
    *  - per-label totals and the shared train vocabulary size are tiny
    *    aggregate frames;
    *  - `log P(token|label) = ln((cnt + α) / (total_label + α·|V|))`,
    *    unseen-token default `ln(α / (total_label + α·|V|))`, prior
    *    `ln(n_label_docs / n_docs)`.
    * Returns (model: label, token, logp) and (labelStats: label, logprior,
    * logdefault). Model size is |labels|×|vocab| — broadcastable, the
    * classifier's whole point at 100 TB. */
  def naiveBayesTrain(docs: org.apache.spark.sql.DataFrame, labelCol: String,
      alpha: Double = 1.0, textCol: String = "text",
      tokenizer: Column => Column = tokens)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val toks = docs.select(col(labelCol).as("label"),
        explode(tokenizer(col(textCol))).as("token"))
      .where(col("token") =!= "")
    // Eager localCheckpoint: counts feeds model, totals, vocab AND stats —
    // without it each consumer re-explodes and re-shuffles the corpus
    // (~5 tokenization passes; measured 4 s/row for the char-trigram
    // models at sf0.1). The frame is |labels|x|vocab| — tiny — and
    // lineage-free blocks are freed by the ContextCleaner (the round-3
    // ADVICE discipline), so nothing accumulates across repeats.
    val counts = toks.groupBy(col("label"), col("token"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val totals = counts.groupBy(col("label")).agg(sum(col("cnt")).as("total"))
    val vocabN = counts.select(col("token")).distinct()
      .agg(count(lit(1)).as("v"))
    val model = counts.join(totals, "label").crossJoin(broadcast(vocabN))
      .select(col("label"), col("token"),
        log((col("cnt") + alpha) / (col("total") + lit(alpha) * col("v"))).as("logp"))
    val nDocs = docs.agg(count(lit(1)).as("n"))
    val stats = docs.groupBy(col(labelCol).as("label")).agg(count(lit(1)).as("n_label"))
      .crossJoin(broadcast(nDocs))
      .join(totals, "label").crossJoin(broadcast(vocabN))
      .select(col("label"),
        log(col("n_label") / col("n")).as("logprior"),
        log(lit(alpha) / (col("total") + lit(alpha) * col("v"))).as("logdefault"))
    (model, stats)
  }

  /** Score every document against every label:
    * `score(doc, label) = logprior + Σ_matched logp + n_unmatched·logdefault`.
    * The model broadcasts (vocab-bounded); the only shuffle is the
    * per-(doc, label) partial-sum aggregate. Returns (idCol, label, score). */
  def naiveBayesClassify(docs: org.apache.spark.sql.DataFrame,
      model: org.apache.spark.sql.DataFrame, labelStats: org.apache.spark.sql.DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      tokenizer: Column => Column = tokens): org.apache.spark.sql.DataFrame = {
    val docToks = docs.select(col(idCol), explode(tokenizer(col(textCol))).as("token"))
      .where(col("token") =!= "")
    val matched = docToks.join(broadcast(model), "token")
      .groupBy(col(idCol), col("label"))
      .agg(sum(col("logp")).as("s_matched"), count(lit(1)).as("n_matched"))
    val nToks = docs.select(col(idCol),
      size(filter(tokenizer(col(textCol)), t => t =!= "")).cast("bigint").as("n_toks"))
    nToks.crossJoin(broadcast(labelStats))
      .join(matched, Seq(idCol, "label"), "left_outer")
      .select(col(idCol), col("label"),
        (col("logprior") + coalesce(col("s_matched"), lit(0.0)) +
          (col("n_toks") - coalesce(col("n_matched"), lit(0L))) * col("logdefault"))
          .as("score"))
  }

  /** X72: collect a trained NB (model, labelStats) pair to the wire
    * encoding [[graft.plans.NbModelRef.encode]] consumes — the model is
    * vocab-bounded (|labels|×|vocab|, the classifier's whole point at
    * 100 TB), so this collect is the same bounded-codebook discipline as
    * `bpeTrainOn`'s vocab pull. Feed the result to [[nbArgmax]] /
    * [[nbScores]], which score as a ZERO-SHUFFLE codegen'd scan projection
    * (vs [[naiveBayesClassify]]'s full-corpus explode+join+agg — keep that
    * formulation as the SQL-replayable truth; the kernel is bit-identical:
    * same formula, same 4dp round, same smallest-label tiebreak). */
  def collectNbModel(model: org.apache.spark.sql.DataFrame,
      labelStats: org.apache.spark.sql.DataFrame): Seq[String] = {
    val labels = labelStats.select(col("label"), col("logprior"), col("logdefault"))
      .collect().toSeq.map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val rows = model.select(col("token"), col("label"), col("logp"))
      .collect().toSeq.map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    graft.plans.NbModelRef.encode(labels, rows)
  }

  /** Fused train-and-collect for the kernel path: TWO Spark jobs total —
    * the (label, token, cnt) aggregate (the one corpus-scale pass) and the
    * per-label doc counts — then the closed-form smoothing runs DRIVER-SIDE
    * over the vocab-bounded counts. Numerically IDENTICAL to
    * [[naiveBayesTrain]] + [[collectNbModel]]: the same IEEE double
    * expressions ((cnt+α)/(total+α·v) etc., Math.log both here and in
    * Spark's log), just not spread across five chained tiny jobs — the r15
    * d_lang_id_ngram drift was ~0.9 s of model/stats/checkpoint job
    * scheduling after the counts pass (LangIdProbe measured the phases).
    * NbKernelSpec pins equality against the DataFrame formulation. */
  def collectNbModelFused(docs: org.apache.spark.sql.DataFrame, labelCol: String,
      alpha: Double = 1.0, textCol: String = "text",
      tokenizer: Column => Column = tokens): Seq[String] = {
    val counts = docs.select(col(labelCol).as("label"),
        explode(tokenizer(col(textCol))).as("token"))
      .where(col("token") =!= "")
      .groupBy(col("label"), col("token"))
      .agg(count(lit(1)).as("cnt"))
      .collect().toSeq.map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val labelDocs = docs.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_label"))
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
    val totals = counts.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val v = counts.map(_._2).distinct.size
    val n = labelDocs.map(_._2).sum
    // StrictMath.log, not math.log: Spark's Log expression evaluates via
    // StrictMath (JVM-reproducible), and the wire encoding carries raw
    // double bits — Math.log's intrinsic differs in the last ulp
    val labels = labelDocs.map { case (l, nl) =>
      (l, StrictMath.log(nl.toDouble / n),
        StrictMath.log(alpha / (totals(l) + alpha * v)))
    }
    val rows = counts.map { case (l, tok, cnt) =>
      (tok, l, StrictMath.log((cnt + alpha) / (totals(l) + alpha * v)))
    }
    graft.plans.NbModelRef.encode(labels, rows)
  }

  /** nb_argmax(lc) → struct<label, score>: winning label over the collected
    * model, scores rounded to 4dp before the argmax, ties → smallest label.
    * Input must be the caller-staged normalized text (lower(trim(text))) —
    * the kernel slices code-point n-grams of exactly what it's given, the
    * same contract as [[charNgramsOf]]. Requires SketchFunctions.register. */
  def nbArgmax(text: Column, encodedModel: Seq[String], n: Int = 3): Column =
    call_function("nb_argmax", text.cast("string"), typedlit(encodedModel), lit(n))

  /** nb_scores(lc) → array<double>: the full rounded-4dp score vector in
    * sorted-label order (calibration / threshold-gating consumers). */
  def nbScores(text: Column, encodedModel: Seq[String], n: Int = 3): Column =
    call_function("nb_scores", text.cast("string"), typedlit(encodedModel), lit(n))

  /** X71: deterministic EPOCH SHUFFLE — the seeded global permutation +
    * sharding every pretraining run applies per epoch: order key =
    * md5("ep<epoch>:<doc_id>") (different epochs → different, REPRODUCIBLE
    * permutations — no rand(), the d_hash_sample discipline), shard = the
    * key's first `shardNibbles` hex nibbles (shard count = 16^k; at 100 TB
    * one nibble means a multi-TB sort per shard — size k to the corpus so
    * each shard's sort fits an executor), position = rank within the
    * shard. Physical shape is the real 100 TB write: ONE hash exchange on
    * (epoch, shard) + sort within partitions — never a global total-order
    * sort. The nibble arithmetic is plain instr/substring so DuckDB
    * replays the shard ids character-for-character. */
  def epochShuffle(docs: org.apache.spark.sql.DataFrame, epochs: Seq[Int],
      shardNibbles: Int = 1, idCol: String = "doc_id")
      : org.apache.spark.sql.DataFrame = {
    require(shardNibbles >= 1 && shardNibbles <= 8,
      s"shardNibbles must be in [1, 8], got $shardNibbles")
    val shard = (1 to shardNibbles).map { i =>
      val digit = s"(instr('0123456789abcdef', substring(k, $i, 1)) - 1)"
      val scale = math.pow(16, shardNibbles - i).toLong
      if (scale == 1L) digit else s"$digit * ${scale}L"
    }.mkString(" + ")
    val keyed = docs
      .select(col(idCol), explode(array(epochs.map(lit): _*)).as("epoch"))
      .withColumn("k", md5(concat(lit("ep"), col("epoch").cast("string"),
        lit(":"), col(idCol).cast("string"))))
      .withColumn("shard", expr(shard).cast("int"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("epoch"), col("shard"))
      .orderBy(col("k"), col(idCol))
    keyed.select(col("epoch"), col("shard"), col(idCol),
      row_number().over(w).cast("bigint").as("pos"))
  }

  /** BPE-ish subword count: word pieces + digits + punctuation as separate
    * tokens, the usual pre-tokenizer regex shape. */
  def subwordCount(text: Column): Column =
    size(filter(split(lower(text), "[^a-z0-9']+"), t => length(t) > 0))

  /** Word n-grams (shingles) joined by single spaces: the dedup unit.
    * Native codegen'd expression (requires SketchFunctions.register). */
  def wordNgrams(text: Column, n: Int): Column =
    graft.plans.SketchFunctions.word_ngrams(text, n)

  /**
   * X65: the corpus DOCUMENT-FREQUENCY plane — one (tok, df) row per
   * distinct word `n`-gram, df = number of documents containing it (each
   * doc counts once: per-doc distinct before the count). This is the
   * corpus statistic several operators consume independently — X56
   * ppjoinPairs' rarest-first prefix order, X54 bm25TopK's idf, stopword
   * discovery (d_doc_freq) — and the X53 tokenize-once discipline says a
   * multi-operator pipeline should compute it ONCE: pass `persist = true`
   * and hand the returned frame to every consumer (`docFreq` parameters on
   * ppjoinPairs / bm25TopK); each consumer then reads the cached plane
   * (InMemoryTableScan — DocFreqSpec pins it) instead of re-scanning and
   * re-tokenizing the corpus.
   *
   * Scale shape: one explode + one groupBy(tok) count with map-side
   * partials; the plane is vocabulary-sized (Heaps'-law sublinear in the
   * corpus), so persisting it is cheap and at 100 TB it would be a written
   * table maintained incrementally, not a cache. Tokenization is the
   * engine-wide `tokens`/word_ngrams contract (trim+lower, \s+ split), so
   * the plane is interchangeable across every consumer with the same n.
   */
  def corpusDocFreq(
      docs: org.apache.spark.sql.DataFrame,
      n: Int = 1,
      idCol: String = "doc_id",
      textCol: String = "text",
      persist: Boolean = false): org.apache.spark.sql.DataFrame = {
    graft.plans.SketchFunctions.register(docs.sparkSession)
    val plane = docs
      .select(explode(array_distinct(wordNgrams(col(textCol), n))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("df"))
    if (persist) plane.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else plane
  }

  /** Character n-grams of an ALREADY-normalized string column. Pass an
    * ATTRIBUTE, not an expression: a HOF lambda re-evaluates its subtree
    * per element, so slicing anything but a named column rebuilds it once
    * per gram (the X66 292 s lesson). */
  def charNgramsOf(s: Column, n: Int): Column =
    when(length(s) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), length(s) - lit(n)),
        i => s.substr(i + 1, lit(n))))

  /** Character n-grams of the normalized text. For hot paths, stage
    * lower(trim(text)) as its own column and call [[charNgramsOf]]. */
  def charNgrams(text: Column, n: Int): Column = charNgramsOf(lower(trim(text)), n)

  /** Ratio of non-alphanumeric, non-space characters (punctuation density). */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[^a-zA-Z0-9\\s]", ""))) /
      greatest(length(text), lit(1))

  /** Ratio of digit characters. */
  def digitRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[0-9]", ""))) / greatest(length(text), lit(1))

  /** Mean token length. */
  def meanTokenLen(text: Column): Column = {
    val toks = tokens(text)
    length(regexp_replace(trim(lower(text)), "\\s+", "")) / greatest(size(toks), lit(1))
  }

  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "be", "this", "that", "from")

  /** Fraction of tokens that are stopwords — the classic fluency signal. */
  def stopwordRatio(text: Column, stopwords: Seq[String] = EnglishStopwords): Column = {
    val toks = tokens(text)
    val stops = array(stopwords.map(lit): _*)
    size(filter(toks, t => array_contains(stops, t))) / greatest(size(toks), lit(1))
  }

  /**
   * Composite quality score in [0,1]: rewards stopword presence and sane mean
   * token length, penalizes punctuation/digit noise — a C4/Gopher-style
   * heuristic filter computed in one codegen'd projection.
   */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text) / lit(50.0), lit(1.0))
    val stopScore = least(stopwordRatio(text) * lit(5.0), lit(1.0))
    val punctPenalty = least(punctRatio(text) * lit(5.0), lit(1.0))
    val digitPenalty = least(digitRatio(text) * lit(5.0), lit(1.0))
    round((lenScore + stopScore + (lit(1.0) - punctPenalty) + (lit(1.0) - digitPenalty)) / lit(4.0), 6)
  }

  /** Per-language marker words for the n-gram/stopword language-ID heuristic. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "with", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "mit", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "des"),
    "es" -> Seq("el", "la", "los", "y", "es", "una", "con"),
    "zh" -> Seq("de", "shi", "le", "zai", "you", "wo", "ta"))

  /** Marker-hit count for one language. */
  def langScore(text: Column, markers: Seq[String]): Column = {
    val toks = tokens(text)
    val m = array(markers.map(lit): _*)
    size(filter(toks, t => array_contains(m, t)))
  }

  /**
   * Heuristic language ID: argmax of marker-word hits, first-listed language
   * wins ties, "und" (undetermined) when nothing matches. Deterministic, so it
   * is SQL-expressible and oracle-checkable.
   */
  def langId(text: Column): Column = {
    val scores = LangMarkers.map { case (lang, markers) => lang -> langScore(text, markers) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Exact content fingerprint: md5 of whitespace-normalized lowercase text.
    * (md5 is available and identical in DuckDB — oracle-checkable.) */
  def contentFingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))

  /** Winnowing-style shingle fingerprint: the minimum md5 over word 3-grams —
    * a 1-value document sketch stable under small edits at either end. One
    * fused native pass (requires SketchFunctions.register); fewer than n
    * tokens falls back to md5 of the normalized text. */
  def shingleFingerprint(text: Column, n: Int = 3): Column =
    graft.plans.SketchFunctions.min_gram_md5(text, n)

  /** Deterministic corpus sampling: keep a document iff the md5 of its id
    * falls below the hex threshold for `percent` — reproducible across
    * engines and runs (unlike rand()-based sampling), stable under corpus
    * growth (a doc's fate never depends on other docs), and pushes down as a
    * plain filter (no shuffle, no global state). The standard shape for
    * carving deterministic train/eval subsets out of a 100 TB corpus. */
  def hashSample(id: Column, percent: Int): Column = {
    require(percent >= 0 && percent <= 100, s"percent must be 0..100, got $percent")
    // First two hex chars give 256 buckets; percent p keeps floor(256·p/100).
    // p=100 must short-circuit: its cutoff (0x100) renders as the 3-char
    // "100", which sorts BELOW most 2-char hex strings lexicographically and
    // would silently sample ~6%.
    if (percent == 100) lit(true)
    else substring(md5(id.cast("string")), 1, 2) < lit(f"${(256 * percent) / 100}%02x")
  }

  /** Token-budget sequence packing: assign documents to consecutive packs of
    * ~`budgetTokens` within each shard — the training-batch packing op.
    * Pack id = floor(exclusive-prefix-sum(tokens) / budget), so a document
    * lands in the pack where its first token falls. Windows partition by the
    * shard key (packing is per-worker in a real loader), so no global
    * single-partition window — scales with shard count. */
  def packSequences(docs: org.apache.spark.sql.DataFrame, budgetTokens: Long,
      shardCol: String, idCol: String = "doc_id", textCol: String = "text",
      /** Token counter for the budget — defaults to whitespace tokens; pass
        * [[bpeTokenCount]] to pack on real subword counts (d_pack_bpe). */
      tokenCounter: Column => Column = tokenCount): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(shardCol).as("shard"), col(idCol).as("doc_id"),
        tokenCounter(col(textCol)).cast("bigint").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("pack_id", floor((col("cum_tokens") - col("n_tokens")) / budgetTokens))
      .select(col("shard"), col("doc_id"), col("n_tokens"), col("pack_id"))
  }

  /** X50: fixed-context-window example carving — the final pre-training
    * data-prep stage [[packSequences]] stops short of: per shard, documents
    * concatenate in doc_id order into one token stream that is cut into
    * examples of EXACTLY `ctxTokens` tokens, crossing document boundaries
    * (the last example of a shard may run short). Returns one row per
    * (shard, example_id) with the first/last document feeding it, how many
    * documents it spans, and its token count — the manifest a tokenize-and-
    * shard writer materializes examples from.
    *
    * Shuffle shape for 100 TB: one per-shard cumulative-sum window over
    * (shard, doc, count) — never the text — then each doc EXPLODES only to
    * the examples it overlaps (≤ tokens/ctx + 1 rows, total fan-out =
    * corpus_tokens/ctx + docs), and one partially-aggregated groupBy folds
    * the example manifest. All integer arithmetic: the SQL replay is exact.
    * Per-example n_tokens sums each doc's overlap with the example interval,
    * so every interior example provably carries exactly ctxTokens. */
  def carveContextWindows(docs: org.apache.spark.sql.DataFrame, ctxTokens: Long,
      shardCol: String, idCol: String = "doc_id", textCol: String = "text",
      tokenCounter: Column => Column = tokenCount): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(ctxTokens >= 1, s"ctxTokens must be >= 1, got $ctxTokens")
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(shardCol).as("shard"), col(idCol).as("doc_id"),
        tokenCounter(col(textCol)).cast("bigint").as("n_tokens"))
      .where(col("n_tokens") > 0)
      .withColumn("end_tok", sum(col("n_tokens")).over(w))
      .withColumn("start_tok", col("end_tok") - col("n_tokens"))
      .withColumn("example_id", explode(sequence(
        floor(col("start_tok") / ctxTokens).cast("bigint"),
        floor((col("end_tok") - 1) / ctxTokens).cast("bigint"))))
      .groupBy(col("shard"), col("example_id"))
      .agg(min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"),
        count(lit(1)).as("n_docs"),
        sum(least(col("end_tok"), (col("example_id") + 1) * ctxTokens) -
          greatest(col("start_tok"), col("example_id") * ctxTokens)).as("n_tokens"))
  }

  // Patterns chosen to parse identically under Java regex (Spark) and RE2
  // (DuckDB): character classes, bounded quantifiers, \b word boundaries —
  // no lookarounds, no backreferences.
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b"

  /** Count of pattern matches in `text` (codegen'd regexp_count). */
  def patternCount(text: Column, pattern: String): Column = regexp_count(text, lit(pattern))

  /** PII scrub: redact emails and phone-shaped numbers with typed placeholder
    * tokens — the standard pre-training privacy pass. Pure per-row
    * projection: no shuffle, linear in the corpus, safe to run inside the
    * ingest scan at 100 TB. Returns (scrubbed, n_emails, n_phones) columns
    * via [[piiScrubbed]] + the two counters. */
  def piiScrubbed(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailPattern, "<EMAIL>"), PhonePattern, "<PHONE>")

  /** Intra-document repetition signals — the Gopher-style repetition filter's
    * inputs: distinct-token ratio and the mass of the single most frequent
    * token. A document whose top token carries a large fraction of its length
    * (or whose distinct ratio collapses) is boilerplate/spam. Per-row array
    * ops over the token vector — no shuffle, no explode job. */
  def distinctTokenRatio(text: Column): Column = {
    val toks = tokens(text)
    size(array_distinct(toks)) / greatest(size(toks), lit(1))
  }

  /** Occurrence count of the most frequent token (the numerator of the
    * top-token-mass signal): sort the row's tokens, then one run-length pass —
    * O(n log n) per row, vs the naive O(distinct·n) count-per-distinct-token.
    * State is a (prev, run, best) struct threaded through aggregate(). */
  def topTokenCount(text: Column): Column = {
    val sorted = array_sort(tokens(text))
    val st = aggregate(sorted,
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, tok) => {
        val run = when(tok === acc.getField("prev"), acc.getField("run") + 1).otherwise(lit(1))
        struct(tok.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      })
    st.getField("best")
  }

  /** TF-IDF per (document, token): `(cnt/doc_len) · ln(N/df)` — the
    * vocabulary-weighting building block over [[tokens]] (extends the
    * d_doc_freq corpus statistic to a per-document relevance score).
    *
    * Shuffle shape for 100 TB: the corpus tokenizes ONCE into the (doc,
    * token, cnt) frame; doc length and document frequency are windows over
    * that (much smaller) frame, not re-scans of the text; the single global
    * scalar N arrives via a broadcast cross join — no driver collect, no
    * whole-frame window. */
  def tfIdf(docs: org.apache.spark.sql.DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("cnt"))
    // N from the raw id column, NOT from tf: deriving it from tf would plan a
    // second tokenize+shuffle of the whole corpus; this branch scans one
    // pruned column and aggregates.
    val nDocs = docs.agg(countDistinct(col(idCol)).as("n_docs"))
    tf.withColumn("doc_len", sum(col("cnt")).over(Window.partitionBy("doc_id")))
      .withColumn("df", count(lit(1)).over(Window.partitionBy("token")))
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("token"),
        round((col("cnt").cast("double") / col("doc_len")) *
          log(col("n_docs").cast("double") / col("df")), 6).as("tfidf"))
  }

  /** Per-document bits-per-token under the corpus unigram LM: the weighted
    * mean of `-log2(tc/N)` over a document's tokens, where `tc` is the
    * token's corpus count and `N` the corpus token total — the language-model
    * quality filter in its simplest oracle-checkable form (high bits ⇒ rare
    * vocabulary; a trained-LM perplexity filter is the production twin and
    * slots into the same dataflow).
    *
    * Shuffle shape for 100 TB: the corpus tokenizes ONCE into the (doc,
    * token, cnt) frame; corpus counts are a window over that (much smaller)
    * frame rather than a second tokenize+join, so there is no vocabulary
    * frame to broadcast or shuffle back; the scalar N arrives via a broadcast
    * cross join from a single pruned column scan (the tfIdf discipline). */
  def unigramLogProb(docs: org.apache.spark.sql.DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("cnt"))
    // N from the raw text column, NOT from tf: deriving it from tf would plan
    // a second tokenize+shuffle of the whole corpus.
    val nTokens = docs.agg(sum(tokenCount(col(textCol))).cast("double").as("_n"))
    tf.withColumn("_tc", sum(col("cnt")).over(Window.partitionBy("token")))
      .crossJoin(broadcast(nTokens))
      .groupBy("doc_id")
      .agg(
        round(sum(col("cnt") * -log2(col("_tc") / col("_n"))) / sum(col("cnt")), 6)
          .as("bits_per_token"),
        sum(col("cnt")).as("n_tokens"))
  }

  /** X49: per-document bits-per-bigram under an INTERPOLATED bigram LM —
    * the KenLM-shaped quality filter one rung up from [[unigramLogProb]]:
    * P(w2|w1) = λ·c(w1 w2)/c(w1 ·) + (1−λ)·c(w2)/N, with the bigram term
    * coming from the top-`topK` bigram table only (everything below the cap
    * backs off to the unigram floor — the bounded-model move that keeps the
    * broadcast side fixed-size at any corpus). λ defaults to 0.75: exactly
    * representable in binary, so the interpolation arithmetic is
    * bit-identical across engines and only log2 needs the 6dp round.
    *
    * Shuffle shape for 100 TB: the corpus tokenizes into bigrams once; the
    * bigram-count, left-context-total, and unigram frames are vocabulary-
    * sized (Heaps-sublinear) and BROADCAST back onto the stream together
    * with the scalar N, so scoring lives in the scan projection and the
    * only full shuffle is the per-document mean (map-side partial). Natural
    * text scores low (its bigrams are in the table); shuffled/synthetic
    * text pays the backoff penalty — the Wenzek-style LM filter signal. */
  def bigramLmScore(docs: org.apache.spark.sql.DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      topK: Int = 4096, lambda: Double = 0.75): org.apache.spark.sql.DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    graft.plans.SketchFunctions.register(docs.sparkSession)
    val bi = docs.select(col(idCol).as("doc_id"),
      explode(wordNgrams(col(textCol), 2)).as("gram"))
    val uni = docs.select(explode(tokens(col(textCol))).as("w2"))
      .groupBy("w2").agg(count(lit(1)).as("cu"))
    val nTot = docs.agg(sum(tokenCount(col(textCol))).cast("double").as("n_all"))
    val cb = bi.groupBy("gram").agg(count(lit(1)).as("cb"))
    val topB = cb.orderBy(col("cb").desc, col("gram")).limit(topK)
    val leftTot = cb.groupBy(substring_index(col("gram"), " ", 1).as("w1"))
      .agg(sum(col("cb")).as("cl"))
    bi.join(broadcast(topB), Seq("gram"), "left")
      .withColumn("w1", substring_index(col("gram"), " ", 1))
      .withColumn("w2", substring_index(col("gram"), " ", -1))
      .join(broadcast(leftTot), Seq("w1"))
      .join(broadcast(uni), Seq("w2"))
      .crossJoin(broadcast(nTot))
      .withColumn("p",
        lit(lambda) * coalesce(col("cb").cast("double") / col("cl"), lit(0.0)) +
          lit(1.0 - lambda) * col("cu").cast("double") / col("n_all"))
      .groupBy("doc_id")
      .agg(round(avg(-log2(col("p"))), 6).as("bits_per_bigram"),
        count(lit(1)).as("n_bigrams"))
  }

  /** Per-source top-k vocabulary heavy hitters by DOCUMENT frequency (how
    * many of the source's documents contain the token) — the corpus-drift /
    * boilerplate-detection statistic: a crawl source whose top tokens are
    * "cookie", "javascript", "subscribe" needs a cleaning pass before it
    * feeds training.
    *
    * Shuffle shape for 100 TB: each document contributes each distinct token
    * once (explode of the deduped token array feeds a partially-aggregated
    * groupBy — ONE full shuffle, of (source, token) pairs, not text); the
    * rank window then re-shuffles only the aggregated vocabulary frame, whose
    * per-source size grows sublinearly with the corpus (Heaps' law), so the
    * per-source sort never sees document-scale row counts. Ties break
    * deterministically by token. */
  def topTokensPerSource(docs: org.apache.spark.sql.DataFrame, k: Int,
      sourceCol: String = "source", textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1, got $k")
    val df = docs
      .select(col(sourceCol).as("source"),
        explode(array_distinct(tokens(col(textCol)))).as("token"))
      .groupBy("source", "token").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("source").orderBy(col("df").desc, col("token"))
    df.withColumn("rank", row_number().over(w).cast("bigint"))
      .where(col("rank") <= k)
  }

  /**
   * EXACT corpus-wide top-`m` tokens by occurrence, computed the way it has
   * to be at a web-scale vocabulary: a single-pass Misra–Gries summary of
   * `k` counters per partition (`mapPartitions`, O(k) memory, no shuffle of
   * the token stream), a driver-side candidate merge (≤ partitions × k
   * entries — summaries, never data), then an exact recount of ONLY the
   * broadcast candidate set and a top-m. The MG guarantee makes the result
   * exact, not approximate: any token with frequency > N/(k+1) survives
   * every eviction round, so with m ≪ k the true top-m is contained in the
   * candidates and the recount assigns true counts. The naive alternative —
   * groupBy over every token — shuffles the whole vocabulary; this shuffles
   * `candidates × partitions` rows at most.
   *
   * Ties broken by token ascending, so the result is deterministic and a
   * SQL oracle can state it.
   */
  def heavyHitterTokens(docs: org.apache.spark.sql.DataFrame, m: Int, k: Int = 1024,
      textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    require(m >= 1 && k >= m, s"need k >= m >= 1, got m=$m k=$k")
    val toks = docs.select(explode(tokens(col(textCol))).as("token"))
    import toks.sparkSession.implicits._
    val candidates: Array[String] = toks.as[String].mapPartitions { it =>
      // Misra–Gries: k counters; on overflow decrement all (amortized via
      // eviction of zero-count entries). Survivors = candidate heavy hitters.
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { t =>
        if (counters.contains(t)) counters(t) += 1L
        else if (counters.size < k) counters(t) = 1L
        else {
          counters.mapValuesInPlace((_, v) => v - 1L)
          counters.filterInPlace((_, v) => v > 0L)
        }
      }
      counters.keysIterator
    }.distinct().collect()
    // exact recount of the bounded candidate set only: broadcast semi-join
    // gate (no UDF — stays codegen'd), then map-side combine folds each
    // candidate per task before the (≤ |candidates|-key) shuffle
    toks.join(broadcast(candidates.toSeq.toDF("token")), Seq("token"), "left_semi")
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(m)
  }

  /** 48-bit integer from the md5 of an id — the shared deterministic uniform
    * underlying hashSample (2 hex chars), weighted sampling and source
    * rebalancing (12 hex chars = 48 bits, exact in a double and in both
    * engines' BIGINT). A document's draw depends only on its own id:
    * reproducible across engines, runs, and corpus growth. */
  def hash48(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 12), 16, 10).cast("bigint")

  /**
   * Priority key for deterministic WEIGHTED sampling without replacement
   * (Efraimidis–Spirakis A-ES): key = ln(u)/w with u = (hash48+1)/2^48 ∈
   * (0, 1] — a monotone transform of the textbook u^(1/w), so taking the
   * top-n by key draws each subset with probability proportional to its
   * weights. The md5 draw makes it deterministic; ROUNDING to 12 dp (both
   * engines tie-break equal keys by id) absorbs the ≤2-ulp discrepancy two
   * libm `log`s may carry, so the SQL oracle replays the identical ranking
   * — the round-to-6dp discipline every cosine oracle row uses, applied to
   * the one transcendental in this key.
   */
  def weightedSampleKey(id: Column, weight: Column): Column =
    round(log((hash48(id) + 1).cast("double") / lit(281474976710656.0)) /
      weight.cast("double"), 12)

  /**
   * X34: per-stratum weighted top-n sample — the corpus-mixing primitive
   * that favors (e.g.) longer or higher-quality documents while staying
   * reproducible. One shuffle on the stratum key; the rank window touches
   * each stratum independently (never a global sort), and Spark's
   * WindowGroupLimit rewrite caps the per-partition buffer at n before the
   * exchange. At 100 TB: strata are sources/languages (thousands), so
   * partitions stay balanced; a skewed mega-stratum is exactly the
   * WindowGroupLimit case — each input partition forwards at most n rows
   * per stratum.
   */
  def weightedSample(docs: org.apache.spark.sql.DataFrame, n: Int,
      strataCol: String = "source", weightCol: String = "n_chars",
      idCol: String = "doc_id"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(strataCol))
      .orderBy(weightedSampleKey(col(idCol), col(weightCol)).desc, col(idCol).asc)
    docs
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= n)
      .select(col(strataCol), col(idCol), col(weightCol).cast("bigint").as(weightCol), col("rank"))
  }

  /**
   * X35: rebalance a multi-source corpus to EQUAL per-source document counts
   * by deterministically downsampling every source to the smallest source's
   * size: keep iff hash48(id) < floor(n_min · 2^48 / n_src), the per-source
   * threshold computed ONCE per source. The threshold math is IEEE double
   * (·, /, floor — all bit-determined operations, no transcendentals), so
   * the SQL oracle reproduces it exactly at any count magnitude, with no
   * 64-bit overflow at billion-document sources. Expected kept per source =
   * n_src · (n_min/n_src) = n_min.
   *
   * Plan shape at 100 TB: one tiny count aggregate (|sources| rows), its min
   * cross-joined back and BROADCAST onto the corpus scan — the corpus never
   * shuffles; the filter evaluates inside the scan projection.
   */
  def rebalanceSources(docs: org.apache.spark.sql.DataFrame,
      srcCol: String = "source", idCol: String = "doc_id"): org.apache.spark.sql.DataFrame = {
    val counts = docs.groupBy(col(srcCol)).agg(count(lit(1)).as("n_src"))
    val rates = counts.crossJoin(counts.agg(min(col("n_src")).as("n_min")))
      .select(col(srcCol),
        floor(col("n_min").cast("double") * lit(281474976710656.0) /
          col("n_src").cast("double")).cast("bigint").as("keep_below"))
    docs
      .join(broadcast(rates), Seq(srcCol))
      .where(hash48(col(idCol)) < col("keep_below"))
      .select(col(srcCol), col(idCol))
  }

  /**
   * TEMPERATURE-0.5 source mixing ([[rebalanceSources]] is the α→0 limit):
   * each source downsamples toward the GEOMETRIC MEAN of its own size and
   * the smallest source's — `m_src = floor(sqrt(n_src · n_min))` — the
   * standard α-sampling compromise that up-weights small sources without
   * flattening the mix entirely. Same deterministic machinery: the target
   * size becomes an integer keep-threshold `floor(m_src · 2^48 / n_src)`
   * on the shared 48-bit md5 draw, broadcast onto the scan — every
   * arithmetic step (IEEE sqrt/·,/, floor) is bit-determined, so the SQL
   * oracle replays document fates exactly; the corpus never shuffles.
   */
  def temperatureMixSources(docs: org.apache.spark.sql.DataFrame,
      srcCol: String = "source", idCol: String = "doc_id"): org.apache.spark.sql.DataFrame = {
    val counts = docs.groupBy(col(srcCol)).agg(count(lit(1)).as("n_src"))
    val rates = counts.crossJoin(counts.agg(min(col("n_src")).as("n_min")))
      .select(col(srcCol),
        floor(floor(sqrt(col("n_src").cast("double") * col("n_min").cast("double"))) *
          lit(281474976710656.0) / col("n_src").cast("double"))
          .cast("bigint").as("keep_below"))
    docs
      .join(broadcast(rates), Seq(srcCol))
      .where(hash48(col(idCol)) < col("keep_below"))
      .select(col(srcCol), col(idCol))
  }

  /** Hashed n-gram feature-bucket stream: one row per (doc, feature
    * occurrence) with the feature — word unigrams ∪ bigrams — collapsed to
    * `bucket = hash48(feature) mod buckets`. The DSIR representation (Xie
    * et al. 2023): a FIXED-width feature space whatever the vocabulary, so
    * every downstream model frame is ≤ `buckets` rows and broadcastable at
    * any corpus size; hash collisions are part of the estimator, identical
    * in both engines (shared md5 draw). */
  private def hashedNgramBuckets(docs: org.apache.spark.sql.DataFrame, buckets: Int,
      idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    graft.plans.SketchFunctions.register(docs.sparkSession)
    docs.select(col(idCol).as("doc_id"),
        explode(concat(tokens(col(textCol)), wordNgrams(col(textCol), 2))).as("feat"))
      .select(col("doc_id"), pmod(hash48(col("feat")), lit(buckets.toLong)).as("bucket"))
  }

  /** X53: DSIR importance weights — per-raw-document log importance weight
    * under hashed-n-gram bag-of-words models of a small TARGET (quality
    * reference) corpus vs the RAW corpus itself:
    * `logw(d) = Σ_b c_d[b]·(ln p_t[b] − ln p_r[b])` with add-α smoothing
    * `p[b] = (c[b]+α)/(N+αB)` — Data Selection via Importance Resampling
    * (Xie et al., NeurIPS 2023), the standard pretraining-data targeting
    * move one rung above a quality classifier: no training loop, exactly
    * SQL-replayable.
    *
    * Shuffle shape for 100 TB: both models aggregate the hashed feature
    * stream into ≤ B-row frames (map-side combine; B is a constant, so the
    * exchanges are tiny regardless of corpus size); the per-bucket
    * log-likelihood-ratio frame joins the model scalars via broadcast
    * cross join and BROADCASTS back onto the raw feature stream, so
    * scoring is scan-side and the only document-scale shuffle is the final
    * per-doc partial-aggregated sum. Cross-engine determinism: the
    * per-bucket LLR quantizes to an 8dp INTEGER (`round(llr·1e8)` — a
    * per-bucket constant both engines agree on), so the per-doc sum is
    * EXACT bigint arithmetic with no summation-order noise, and the final
    * `logw = Σ/1e8` is the same IEEE division of the same integer in every
    * engine — bit-identical, no output rounding needed. */
  def dsirLogWeights(raw: org.apache.spark.sql.DataFrame,
      target: org.apache.spark.sql.DataFrame, buckets: Int = 256, alpha: Double = 0.5,
      idCol: String = "doc_id", textCol: String = "text"): org.apache.spark.sql.DataFrame =
    dsirWeightsE8(raw, target, buckets, alpha, idCol, textCol)
      .select(col("doc_id"),
        (col("logw_e8").cast("double") / lit(1e8)).as("logw"), col("n_feats"))

  /** [[dsirLogWeights]]' exact integer core: per-doc Σ of the 8dp-quantized
    * per-bucket LLR as a BIGINT (`logw_e8` = logw·1e8). */
  private def dsirWeightsE8(raw: org.apache.spark.sql.DataFrame,
      target: org.apache.spark.sql.DataFrame, buckets: Int, alpha: Double,
      idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val spark = raw.sparkSession
    // ≤`buckets` rows, pinned (r17): the frame has two consumers — the
    // domain join and the n_t scalar — and the plan-dump showed the n_t
    // branch re-scanning + re-exploding the whole TARGET corpus because an
    // inferred isnotnull(bucket) filter made the two aggregate subtrees
    // non-identical, defeating exchange reuse (the raw side's pdb reuses
    // fine). One eager checkpoint of a 64-row frame ends that.
    val tb = hashedNgramBuckets(target, buckets, idCol, textCol)
      .groupBy("bucket").agg(count(lit(1)).as("ct"))
      .localCheckpoint(true)
    // ONE tokenize+explode pass over the raw corpus: both the raw model
    // counts and the scoring pass hang off the same (doc, bucket)
    // pre-aggregation, so its exchange is planned once and REUSED
    // (ReusedExchange) — the expensive feature stream never recomputes.
    val pdb = hashedNgramBuckets(raw, buckets, idCol, textCol)
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("c"))
    val rb = pdb.groupBy("bucket").agg(sum(col("c")).as("cr"))
    // full bucket domain: α-smoothing must cover buckets one side never hit.
    // The model totals n_t/n_r ride a single-partition WINDOW over the
    // ≤`buckets`-row joined frame (r17) instead of two crossJoin(broadcast(
    // agg)) scalar branches: each scalar branch re-aggregated its model
    // from the corpus in a subtree the optimizer's inferred-filter
    // differences kept from reusing the main exchange — the plan-dump
    // showed the RAW corpus scanned (and exploded) a second time just to
    // total 64 numbers. sum() over the window skips nulls, so the totals
    // (including null-on-empty) are exactly the old aggregates.
    val dom = spark.range(buckets).select(col("id").as("bucket"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    val llr = dom
      .join(tb, Seq("bucket"), "left").join(rb, Seq("bucket"), "left")
      .withColumn("n_t", sum(col("ct")).over(wAll).cast("double"))
      .withColumn("n_r", sum(col("cr")).over(wAll).cast("double"))
      .select(col("bucket"),
        round((log((coalesce(col("ct"), lit(0L)).cast("double") + lit(alpha)) /
            (col("n_t") + lit(alpha * buckets))) -
          log((coalesce(col("cr"), lit(0L)).cast("double") + lit(alpha)) /
            (col("n_r") + lit(alpha * buckets)))) * lit(1e8), 0)
          .cast("bigint").as("llr_e8"))
    pdb.join(broadcast(llr), Seq("bucket"))
      .groupBy("doc_id")
      .agg(sum(col("llr_e8") * col("c")).as("logw_e8"), sum(col("c")).as("n_feats"))
  }

  /** X53b: DSIR importance RESAMPLING — draw `n` raw documents without
    * replacement with probability ∝ exp(logw) via the Gumbel-top-k trick:
    * `key = logw + Gumbel(doc)` with the Gumbel noise `−ln(−ln u)` driven
    * by the shared deterministic 48-bit md5 draw `u = (hash48(id)+1)/2^48`
    * — the A-ES discipline ([[weightedSamplePriority]]) applied to
    * log-space weights, so the draw is reproducible across engines, runs,
    * and corpus growth, and the SQL oracle replays document fates exactly.
    * The Gumbel noise quantizes to the same 8dp integer grid as the LLR,
    * so `key_e8 = logw_e8 + gumbel_e8` is exact bigint arithmetic — the
    * rank order is integer-determined, immune to float noise. One extra
    * scan-side expression on top of [[dsirLogWeights]]; the top-n is a
    * single TakeOrdered (no window, no extra shuffle). */
  def dsirResample(raw: org.apache.spark.sql.DataFrame,
      target: org.apache.spark.sql.DataFrame, n: Int, buckets: Int = 256,
      alpha: Double = 0.5, idCol: String = "doc_id",
      textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val u = (hash48(col("doc_id")) + lit(1L)).cast("double") / lit(281474976710656.0)
    dsirWeightsE8(raw, target, buckets, alpha, idCol, textCol)
      .select(col("doc_id"),
        (col("logw_e8").cast("double") / lit(1e8)).as("logw"),
        (col("logw_e8") + round(-log(-log(u)) * lit(1e8), 0).cast("bigint"))
          .as("key_e8"))
      .orderBy(col("key_e8").desc, col("doc_id"))
      .limit(n)
      .select(col("doc_id"), col("logw"),
        (col("key_e8").cast("double") / lit(1e8)).as("key"))
  }

  /** X54: BM25 ranked retrieval — top-`k` documents per query under
    * Okapi BM25 (Robertson–Spärck Jones):
    * `score(d,q) = Σ_{t∈q} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`
    * with `idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)` (the Lucene-style
    * always-positive form). The retrieval stage a training-data pipeline
    * leans on for targeted decontamination, eval-set mining, and
    * quality-reference expansion.
    *
    * Shuffle shape for 100 TB — inverted-index discipline without
    * materializing an index: the corpus tokenizes ONCE into a (doc, dl,
    * token) stream (doc length rides each row, so no second scan or
    * doc-length join); a BROADCAST semi-join on the query-term set prunes
    * the stream to matching posting rows BEFORE any aggregation, so the
    * (doc, token)→tf groupBy shuffles only rows whose token appears in
    * some query — |postings(q-terms)|, not the corpus. `df` aggregates
    * that same pruned frame (≤ |terms| rows, broadcast back); N/avgdl are
    * scalars via broadcast cross join from a pruned column scan. The final
    * per-(query, doc) sum is a partial-aggregated shuffle of scored
    * posting rows; the per-query top-k runs on the aggregated frame
    * (WindowGroupLimit caps per-partition buffers at k). Query-term tf is
    * ignored (`array_distinct`) — the standard short-query form. */
  def bm25TopK(docs: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame, k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75, idCol: String = "doc_id",
      textCol: String = "text",
      docFreq: Option[org.apache.spark.sql.DataFrame] = None): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1, got $k")
    val qterms = queries.select(col("query_id"),
      explode(array_distinct(tokens(col("query")))).as("token"))
    val stream = docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("tk"))
      .select(col("doc_id"), size(col("tk")).cast("bigint").as("dl"),
        explode(col("tk")).as("token"))
    val scalars = docs.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(tokenCount(col(textCol)).cast("double")).as("avgdl"))
    val postings = stream
      .join(broadcast(qterms.select("token").distinct()), Seq("token"), "left_semi")
      .groupBy(col("doc_id"), col("dl"), col("token"))
      .agg(count(lit(1)).cast("double").as("tf"))
    // idf needs the TRUE per-term corpus document frequency; postings are
    // pruned to query terms but keep every doc containing one, so counting
    // them equals the corpus df restricted to query terms. A shared X65
    // plane (corpusDocFreq at n=1 — same tokenizer) can be passed in
    // instead, semi-joined down to the query vocabulary; a pipeline that
    // already built the plane then skips this corpus re-aggregation.
    val df = docFreq match {
      case Some(plane) => plane
        .join(broadcast(qterms.select(col("token")).distinct()),
          plane("tok") === col("token"), "left_semi")
        .select(col("tok").as("token"), col("df").cast("double").as("df"))
      case None =>
        postings.groupBy("token").agg(count(lit(1)).cast("double").as("df"))
    }
    // per-term contribution quantized to an 8dp integer so the per-(query,
    // doc) sum is exact bigint arithmetic — no cross-engine summation-order
    // noise at the rank boundary (the dsirLogWeights discipline)
    val scored = postings
      .join(broadcast(df), Seq("token"))
      .join(broadcast(qterms), Seq("token"))
      .crossJoin(broadcast(scalars))
      .select(col("query_id"), col("doc_id"),
        round((round(log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)), 8) *
          col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
          * lit(1e8), 0).cast("bigint").as("part_e8"),
        lit(1L).as("one"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score_e8").desc, col("doc_id"))
    scored.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("part_e8")).as("score_e8"), sum(col("one")).as("n_terms"))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("doc_id"),
        (col("score_e8").cast("double") / lit(1e8)).as("score"),
        col("n_terms"), col("rank"))
  }

  /**
   * X66: Gopher-style repetition quality rules (Rae et al. 2021, Table A1,
   * adapted to token units — the fixture corpus has no newlines or
   * punctuation, so the line-based originals map to fixed 10-token chunks
   * and token n-grams). Per document:
   *  - `dup_chunk_frac` — duplicate fraction of the fixed `chunkTokens`
   *    segments (the duplicate-line/paragraph rule);
   *  - `top_bigram_frac` — 2·count(most frequent bigram) / n_tokens (the
   *    top-2-gram coverage rule; only the COUNT matters, so no tie-break
   *    is needed);
   *  - `dup_5gram_frac` — duplicate fraction of sliding 5-grams (the
   *    duplicate-n-gram rule — alignment-free, so ANY repeated passage
   *    moves it, unlike the chunk rule);
   *  - `keep` — all three under their Gopher-shaped thresholds
   *    (0.3 / 0.2 / 0.3), decided by INTEGER cross-multiplication so the
   *    SQL oracle replays the flag without float-boundary risk.
   *
   * Scale shape: ONE native codegen'd kernel per row
   * ([[graft.plans.RepetitionSignalsExpr]]) — no shuffle, no groupBy, no
   * window (the plan spec pins Exchange-free + whole-stage codegen), O(m)
   * in document length. HISTORY: this was first built from higher-order
   * array functions with staged projections (the 292 s → 1.75 s staging
   * fix), but staging only protects Project-to-Project collapse — a
   * downstream `.where(keep)` lets predicate pushdown inline the whole
   * tree into a Filter, where HOF lambdas re-evaluate their subtree per
   * element (the X70 pipeline re-ran full HTML extraction once per n-gram:
   * ~700 s on one sf0.1 partition). The kernel tokenizes once per call
   * under ANY plan shape. `carryCols` ride through unchanged so a
   * STREAMING consumer can keep its payload without a stream-stream join.
   */
  def repetitionSignals(docs: org.apache.spark.sql.DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      chunkTokens: Int = 10,
      carryCols: Seq[String] = Nil): org.apache.spark.sql.DataFrame = {
    graft.plans.SketchFunctions.register(docs.sparkSession)
    val carry = carryCols.map(col)
    val r = call_function("repetition_signals",
      col(textCol).cast("string"), lit(chunkTokens))
    docs
      .select(col(idCol) +: carry :+ r.as("_r"): _*)
      .select(col(idCol) +: carry :+
        col("_r.n_tokens").as("n_tokens") :+
        col("_r.dup_chunk_frac").as("dup_chunk_frac") :+
        col("_r.top_bigram_frac").as("top_bigram_frac") :+
        col("_r.dup_5gram_frac").as("dup_5gram_frac") :+
        col("_r.keep").as("keep"): _*)
  }
}
