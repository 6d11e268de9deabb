package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.plans.{BpeOps, ByteBpeOps}

/**
 * Byte-level BPE (X99): the public byte→unicode table construction, the
 * no-[unk]-by-construction guarantee, encode∘decode identity on exactly the
 * content code-point tokenizers mangle (multi-byte UTF-8, emoji, URLs),
 * deterministic training over byte symbols, and the codegen path.
 */
class ByteBpeSpec extends SparkSpec {
  import spark.implicits._

  test("byte table: 256 distinct single-char symbols, printables self-map, no whitespace") {
    val t = ByteBpeOps.ByteTable
    assert(t.length == 256)
    assert(t.distinct.length == 256, "table must be a bijection")
    assert(t.forall(_.length == 1))
    // the three keep-ranges map to themselves
    ((33 to 126) ++ (161 to 172) ++ (174 to 255)).foreach { b =>
      assert(t(b) == b.toChar.toString, s"byte $b must self-map")
    }
    // the 68 others map to 256+n in order — space is the famous 'Ġ' (U+0120)
    assert(t(32) == "Ġ")
    assert(t(0) == "Ā")
    assert(t(10) == "Ċ") // newline → 'Ċ'
    // no symbol is whitespace (space-joined token streams stay unambiguous)
    assert(t.forall(s => !s.charAt(0).isWhitespace))
    // none collides with the oracle's chr(1)/chr(2) framing separators
    assert(!t.contains("\u0001") && !t.contains("\u0002"))
  }

  test("toSymbols/fromSymbols round-trip any string; multi-byte chars split into bytes") {
    val samples = Seq("hello", "café", "über", "日本語", "🙂", "naïve",
      "https://example.com/a?q=1&x=ü", "mixed 日本 and 🙂 text", "",
      "\u0000weird\u0007bytesÿ")
    samples.foreach { s =>
      assert(ByteBpeOps.fromSymbols(ByteBpeOps.toSymbols(s).map(identity)) == s, s)
    }
    assert(ByteBpeOps.toSymbols("é").length == 2)   // 2-byte UTF-8
    assert(ByteBpeOps.toSymbols("語").length == 3)  // 3-byte UTF-8
    assert(ByteBpeOps.toSymbols("🙂").length == 4)  // 4-byte UTF-8
    assert(ByteBpeOps.toSymbols("a").length == 1)
  }

  test("training is deterministic over byte symbols and the ASCII core matches BpeOps") {
    // pure-ASCII vocab: byte symbols ARE the chars, so the two trainers
    // must learn the identical table
    val vocab = Seq("abab" -> 3L, "abc" -> 1L)
    assert(ByteBpeOps.train(vocab, 3) == BpeOps.train(vocab, 3))
    // non-ASCII vocab: the byte trainer merges BYTE pairs (é = 2 symbols)
    val m = ByteBpeOps.train(Seq("éé" -> 5L), 3)
    val eBytes = ByteBpeOps.toSymbols("é")
    assert(m.head == (eBytes(0), eBytes(1)),
      s"first merge must fuse é's two bytes, got ${m.head}")
  }

  test("the seed merge table has 48 merges and encode∘decode is the identity — no [unk] ever") {
    val merges = TextFunctions.ByteBpeSeedMerges
    assert(merges.size == 48)
    val ranks = BpeOps.rankMap(merges)
    val mergeArr = merges.toIndexedSeq
    // adversarial inputs: none of these can fail or [unk] — worst case is
    // falling back to raw byte symbols
    val inputs = Seq("café", "über", "日本語", "🙂🙂", "table", "query",
      "https://example.com/a", "zzzzqqqq", "ñ", "☃", "a🙂b",
      "ĀĠŃ") // symbols-as-input must still round-trip (they are real chars)
    inputs.foreach { w =>
      val toks = ByteBpeOps.encodeWord(w, mergeArr, ranks)
      assert(toks.nonEmpty)
      assert(ByteBpeOps.fromSymbols(toks) == w, s"decode(encode($w))")
    }
    // seed words encode to their final TRAINING segmentation (replaying
    // merges in rank order = the training rewrites) — spot-check the
    // heaviest word fused completely
    val topToks = ByteBpeOps.encodeWord("table", mergeArr, ranks)
    assert(topToks == IndexedSeq("table"), s"got $topToks")
  }

  test("GPT-2 pre-tokenizer: contractions, space-carry, multi-space donation, case kept") {
    import ByteBpeOps.preTokenize
    // single spaces attach to the following word (the Ġ convention)
    assert(preTokenize("Hello world") == Seq("Hello", " world"))
    // contractions split case-sensitively; uppercase 'S is NOT a contraction
    assert(preTokenize("don't STOP") == Seq("don", "'t", " STOP"))
    assert(preTokenize("IT'S") == Seq("IT", "'", "S"))
    // a multi-space run donates its LAST space to the next word (the
    // \s+(?!\S) backtrack) and keeps the rest as a whitespace token
    assert(preTokenize("a   b") == Seq("a", "  ", " b"))
    assert(preTokenize("multi  space") == Seq("multi", " ", " space"))
    // trailing whitespace stays whole; leading run donates one space
    assert(preTokenize("ab  ") == Seq("ab", "  "))
    assert(preTokenize("  hi") == Seq(" ", " hi"))
    // non-space whitespace never attaches (the ` ?` is a literal space)
    assert(preTokenize("a\nb") == Seq("a", "\n", "b"))
    // digits and punctuation are their own classes
    assert(preTokenize("price: $4.99!") ==
      Seq("price", ":", " $", "4", ".", "99", "!"))
    // total coverage: concatenation reconstructs ANY input exactly
    Seq("Hello  World", " 'bout", "x\n\n\ny", "café 日本語 🙂🙂", "",
      "a\tb \t c", "Mixed CASE  don't   stop ").foreach { s =>
      assert(preTokenize(s).mkString == s, s"coverage of ${s.replace("\n", "\\n")}")
    }
  }

  test("the engine expression matches the driver-side kernel, emoji and URLs included") {
    graft.plans.SketchFunctions.register(spark)
    val texts = Seq(
      (1L, "Table stream CAFÉ über"),
      (2L, "visit https://example.com/a now 🙂🙂"),
      (3L, "日本語 text with naïve words"),
      // mixed case + multi-space + contraction + tabs/newlines: the
      // production pre-tokenizer must carry ALL of it losslessly
      (4L, "Don't  SHOUT   at\tthe\n\nparser, it's  fine "))
    val docs = texts.toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        TextFunctions.byteBpeEncode(col("text"), TextFunctions.ByteBpeSeedMerges).as("arr"))
      .as[(Long, Seq[String])].collect().toMap
    val ranks = BpeOps.rankMap(TextFunctions.ByteBpeSeedMerges)
    val mergeArr = TextFunctions.ByteBpeSeedMerges.toIndexedSeq
    texts.foreach { case (id, text) =>
      val want = ByteBpeOps.preTokenize(text)
        .flatMap(w => ByteBpeOps.encodeWord(w, mergeArr, ranks)).toSeq
      assert(got(id) == want, s"doc $id")
      // WHOLE-document decode identity — case, spacing, tabs, newlines:
      // the pre-tokens cover the text and byte symbols are lossless
      assert(ByteBpeOps.fromSymbols(got(id)) == text, s"identity on doc $id")
    }
  }

  test("distributed byte trainer: zero-merge segmentation seeds it; ASCII corpus matches X84") {
    import org.apache.spark.sql.functions.col
    graft.plans.SketchFunctions.register(spark)
    // byteBpeSymbols = byte_bpe_encode with ZERO merges = raw byte stream
    val syms = Seq(Tuple1("café")).toDF("text")
      .select(TextFunctions.byteBpeSymbols(col("text")).as("s"))
      .as[Seq[String]].head()
    assert(syms == graft.plans.ByteBpeOps.toSymbols("café"))
    // on a pure-ASCII corpus the byte plane IS the char plane, so the two
    // distributed trainers must learn identical merge sequences
    val docs = Seq("table table row data", "table row query data data",
      "batch window stream table").toDF("text")
    val (m1, _) = TextFunctions.bpeTrainDistributed(docs, 5)
    val (m2, _) = TextFunctions.byteBpeTrainDistributed(docs, 5)
    assert(m1 == m2)
    // a non-ASCII corpus diverges: the byte trainer's first merge fuses
    // BYTES of the multibyte char, which the char plane cannot express
    val nonAscii = Seq("éé éé éé").toDF("text")
    val (mb, _) = TextFunctions.byteBpeTrainDistributed(nonAscii, 1)
    val eB = graft.plans.ByteBpeOps.toSymbols("é")
    assert(mb.head._2 == s"${eB(0)} ${eB(1)}", mb)
  }

  test("byte-level counts differ from code-point counts exactly on non-ASCII content") {
    // the mis-budgeting X15/X50 suffered under approximate counters: a
    // code-point tokenizer sees é as ONE unit, byte-level sees TWO bytes
    // (pre-merge) — on ASCII the planes coincide
    val cp = BpeOps.encodeWord("cafe", TextFunctions.BpeSeedMerges.toIndexedSeq,
      BpeOps.rankMap(TextFunctions.BpeSeedMerges))
    val bl = ByteBpeOps.encodeWord("cafe", TextFunctions.ByteBpeSeedMerges.toIndexedSeq,
      BpeOps.rankMap(TextFunctions.ByteBpeSeedMerges))
    assert(cp.mkString == bl.mkString, "ASCII text reconstructs identically")
    val emoji = ByteBpeOps.toSymbols("🙂")
    assert(emoji.length == 4 && "🙂".length == 2,
      "the unit of account genuinely differs (4 bytes vs 2 UTF-16 units vs 1 code point)")
  }
}
