package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.plans.WordPieceOps

/**
 * X75 WordPiece encoding: greedy longest-match-first, ##-continuations,
 * the all-or-nothing [unk] rule, and byte-for-byte determinism — the
 * properties the d_wordpiece_encode oracle replays with the vocab as
 * literals.
 */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private val v = new WordPieceOps.Vocab(TextFunctions.WordPieceSeedVocab)

  test("greedy longest-match-first: prefers the longest piece at each position") {
    assert(WordPieceOps.encodeWord("the", v).toSeq == Seq("the"))
    // "thering": root 'the' (not 'th'), then ##r, then ##ing (not ##i ##n ##g)
    assert(WordPieceOps.encodeWord("thering", v).toSeq == Seq("the", "##r", "##ing"))
    // 'stream' is a whole root piece
    assert(WordPieceOps.encodeWord("stream", v).toSeq == Seq("stream"))
    assert(WordPieceOps.encodeWord("streaming", v).toSeq == Seq("stream", "##ing"))
    // continuation pieces apply only after position 0: 'ing' alone must
    // NOT match ##ing at the word start
    assert(WordPieceOps.encodeWord("ing", v).toSeq == Seq("i", "##ng")
      || WordPieceOps.encodeWord("ing", v).head != "##ing")
  }

  test("[unk] is all-or-nothing: any unmatchable position unks the whole word") {
    assert(WordPieceOps.encodeWord("café", v).toSeq == Seq(WordPieceOps.Unk))
    assert(WordPieceOps.encodeWord("x-y", v).toSeq == Seq(WordPieceOps.Unk))
    assert(WordPieceOps.encodeWord("a.b", v).toSeq == Seq(WordPieceOps.Unk))
    // the matchable PREFIX does not leak out before the failure
    assert(WordPieceOps.encodeWord("table!", v).toSeq == Seq(WordPieceOps.Unk))
  }

  test("singles coverage: every plain alphanumeric word encodes without [unk]") {
    val words = Seq("zzz", "q7x", "42", "abcdefghijklmnopqrstuvwxyz0123456789")
    words.foreach { w =>
      val toks = WordPieceOps.encodeWord(w, v)
      assert(!toks.contains(WordPieceOps.Unk), s"$w -> ${toks.toSeq}")
      // pieces reassemble the word exactly
      assert(toks.map(_.stripPrefix("##")).mkString == w)
    }
  }

  test("expression is deterministic and equals the per-word kernel composition") {
    val texts = Seq(
      (1L, "  The quick  brown tables are STREAMING  "),
      (2L, "query value batch window"),
      (3L, "café naive x-y 42"),
      (4L, ""))
    val df = texts.toDF("id", "text")
    val run1 = df.select(col("id"),
        TextFunctions.wordpieceEncode(col("text")).as("a"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val run2 = df.select(col("id"),
        TextFunctions.wordpieceEncode(col("text")).as("a"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(run1 == run2)
    texts.foreach { case (id, t) =>
      val want = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .flatMap(w => WordPieceOps.encodeWord(w, v)).toSeq
      assert(run1(id) == want, s"id $id")
    }
  }

  test("wordpieceTokenCount counts the stream the encode produces") {
    val got = Seq((1L, "streaming tables")).toDF("id", "text")
      .select(TextFunctions.wordpieceTokenCount(col("text")).as("n"))
      .collect().head.getInt(0)
    // stream ##ing + table ##s
    assert(got == 4)
  }
}
