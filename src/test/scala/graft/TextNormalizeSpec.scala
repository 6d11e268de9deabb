package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.plans.{SketchFunctions, TextNormalizer}

/**
 * Unicode normalization + encoding repair (round-12 directive #2).
 * normalize = CRLF→LF → strict mojibake repair (to fixpoint) → NFC →
 * control/zero-width scrub, the whole pass iterated to fixpoint. All
 * non-ASCII test data is \u-escaped so the assertions are byte-exact
 * regardless of editor/encoding. The properties that matter: idempotency,
 * known mojibake repairs, genuine Latin-1 preserved, repair blocked by any
 * unmappable char, and the expression (codegen) path agreeing with the
 * kernel.
 */
class TextNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  private def n(s: String): String = TextNormalizer.normalize(s)

  test("known single-layer mojibake repairs (latin-1 and cp1252 misreads)") {
    // UTF-8 e-acute = C3 A9 read as latin-1 → "Ã©"
    assert(n("CafÃ©") == "Café")
    // UTF-8 em-dash = E2 80 94 read as cp1252 → "â€”"
    assert(n("a â€” b") == "a — b")
    // UTF-8 right single quote = E2 80 99 read as cp1252 → "â€™"
    assert(n("itâ€™s") == "it’s")
    // UTF-8 a-grave = C3 A0 read as latin-1 → "Ã " (A0 = nbsp)
    assert(n("dÃ©jÃ  vu") == "déjà vu")
    // UTF-8 euro = E2 82 AC read as cp1252 → "â‚¬"
    assert(n("price â‚¬5") == "price €5")
  }

  test("double-encoded mojibake unwinds fully") {
    // e-acute → UTF-8 C3 A9 → misread latin-1 "Ã©" → re-encoded UTF-8
    // C3 83 C2 A9 → misread cp1252 again: 0x83→U+0192, 0xC2→U+00C2
    val doubled = "CafÃƒÂ©"
    assert(n(doubled) == "Café")
  }

  test("genuine Latin-1/accented text is NOT repaired") {
    // 0xE9 followed by end-of-string: invalid UTF-8 → strict decode fails
    assert(n("café") == "café")
    assert(n("naïve résumé") == "naïve résumé")
    // genuine standalone C3 (Portuguese "nÃo"-like): 0xC3 followed by
    // 'o' (non-continuation) fails the strict decode
    assert(n("nÃo repair") == "nÃo repair")
  }

  test("any unmappable char blocks repair of the whole string") {
    // the mojibake prefix WOULD repair, but an emoji can't map to a byte
    val emoji = new String(Character.toChars(0x1F600))
    val s = "CafÃ© " + emoji
    assert(n(s) == s)
    // CJK likewise
    assert(n("CafÃ© 中文") == "CafÃ© 中文")
  }

  test("NFC composition and scrub") {
    // e + combining acute → composed e-acute
    assert(n("café") == "café")
    // zero-widths and BOM dropped
    assert(n("a​b‌c‍d﻿e") == "abcde")
    // soft hyphen dropped
    assert(n("soft­hyphen") == "softhyphen")
    // C0 (except \t \n), DEL, C1 dropped
    assert(n("bell\u0007 del\u007f c1\u0085") == "bell del c1")
    assert(n("keep\ttabs\nand newlines") == "keep\ttabs\nand newlines")
    assert(n("crlf\r\nlone\rend") == "crlf\nlone\nend")
  }

  test("idempotency: normalize(normalize(x)) == normalize(x)") {
    val planted = Gen.oneOf(
      "CafÃ©", "â€™", "café",
      "​﻿", "\r\n", "café", "ÃƒÂ©",
      "­", new String(Character.toChars(0x1F600)),
      "plain ascii", "", "\u0007", " ", "\u00c2\u00a0")
    val gen = Gen.listOf(Gen.frequency(
      6 -> Gen.asciiPrintableChar.map(_.toString),
      2 -> planted,
      1 -> Gen.choose(0x20, 0x2fff).map(cp => new String(Character.toChars(cp)))
    )).map(_.mkString)
    samples(gen, 400, 42L).foreach { s =>
      val once = n(s)
      assert(n(once) == once,
        s"not idempotent on [${s.map(c => f"${c.toInt}%04x").mkString(" ")}]")
    }
  }

  test("expression path (codegen) agrees with the kernel and handles null") {
    SketchFunctions.register(spark)
    val rows = Seq("CafÃ©", "café", "a​b", "plain", null)
    val got = rows.toDF("s")
      .select(SketchFunctions.normalize_text(col("s")).as("t"))
      .collect().map(r => Option(r.getString(0)))
    val want = rows.map(Option(_).map(TextNormalizer.normalize))
    assert(got.toSeq == want)
  }
}
