package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{JpegCodec, PixelCodec}
import PixelCodec.Image

/** Baseline-JPEG codec contract: near-lossless round-trip at unit quant,
  * EXACT decode equality across packaging variants (the property the planted
  * phash oracle rests on), marker-segment robustness, and rejection of
  * everything outside baseline scope. */
class JpegCodecSpec extends AnyFunSuite {

  private def testImage(w: Int, h: Int, seed: Int): Image =
    Image(w, h, Array.tabulate(w * h)(i =>
      ((i * (29 + 2 * seed) + (i / w) * (7 + 5 * seed) + seed * 97) % 256).toByte))

  test("round-trip at unit quant is near-lossless (|err| <= 1 per pixel)") {
    for (seed <- 0 to 3; (w, h) <- Seq((16, 16), (24, 40), (17, 23), (8, 8), (79, 79))) {
      val img = testImage(w, h, seed)
      val dec = JpegCodec.decode(JpegCodec.encodeGray(img)).get
      assert(dec.width == w && dec.height == h)
      val maxErr = img.pixels.zip(dec.pixels)
        .map { case (a, b) => math.abs((a & 0xFF) - (b & 0xFF)) }.max
      // unit quant: the only loss is FDCT coefficient rounding (<=0.5 per
      // coefficient) plus IDCT pixel rounding — bounded to a pixel step
      assert(maxErr <= 1, s"seed=$seed ${w}x$h maxErr=$maxErr")
    }
  }

  test("variants decode to IDENTICAL pixels while sharing no entropy bytes") {
    for (seed <- 0 to 2) {
      val img = testImage(33, 26, seed)
      val v0 = JpegCodec.encodeGray(img, variant = 0)
      val v1 = JpegCodec.encodeGray(img, variant = 1)
      assert(!v0.sameElements(v1))
      val d0 = JpegCodec.decode(v0).get
      val d1 = JpegCodec.decode(v1).get
      assert(d0.width == d1.width && d0.height == d1.height)
      assert(d0.pixels.sameElements(d1.pixels),
        s"seed=$seed: variant decodes differ — coefficients not preserved")
      // and the perceptual hash pairs them at Hamming 0
      assert(PixelCodec.dHash64(d0) == PixelCodec.dHash64(d1))
    }
  }

  test("variant 1 actually uses restart markers and survives resync") {
    val img = testImage(40, 24, 1) // 5x3 = 15 MCUs, restart interval 2 -> 7 RSTn
    val v1 = JpegCodec.encodeGray(img, variant = 1)
    val rsts = v1.sliding(2).count(s =>
      (s(0) & 0xFF) == 0xFF && (s(1) & 0xFF) >= 0xD0 && (s(1) & 0xFF) <= 0xD7)
    assert(rsts == 7, s"expected 7 restart markers, found $rsts")
    assert(JpegCodec.decode(v1).isDefined)
  }

  test("extra APPn/COM segments are skipped; truncation and corruption reject") {
    val img = testImage(24, 16, 2)
    val enc = JpegCodec.encodeGray(img)
    // splice an APP2 and a COM right after SOI (2 bytes in)
    val app2 = Array[Byte](0xFF.toByte, 0xE2.toByte, 0, 6, 1, 2, 3, 4)
    val com = Array[Byte](0xFF.toByte, 0xFE.toByte, 0, 4, 'h', 'i')
    val spliced = enc.take(2) ++ app2 ++ com ++ enc.drop(2)
    val dec = JpegCodec.decode(spliced).get
    assert(dec.pixels.sameElements(JpegCodec.decode(enc).get.pixels))
    // truncated mid-entropy rejects rather than throwing
    assert(JpegCodec.decode(enc.take(enc.length / 2)).isEmpty)
    // header-only payload (SOF0 but no DHT/SOS body) rejects
    assert(JpegCodec.decode(enc.take(30)).isEmpty)
    // not a JPEG at all
    assert(JpegCodec.decode("plainly not a jpeg".getBytes).isEmpty)
    assert(JpegCodec.decode(Array.emptyByteArray).isEmpty)
  }

  test("byte stuffing survives: entropy streams containing 0xFF decode") {
    // scan many seeds/sizes so some entropy segment contains a stuffed FF;
    // correctness of each decode implies the unstuffing path ran clean
    var sawStuffed = false
    for (seed <- 0 to 9) {
      val img = testImage(32, 32, seed)
      val enc = JpegCodec.encodeGray(img)
      var i = 0
      while (i + 1 < enc.length) {
        if ((enc(i) & 0xFF) == 0xFF && (enc(i + 1) & 0xFF) == 0x00) sawStuffed = true
        i += 1
      }
      assert(JpegCodec.decode(enc).isDefined, s"seed=$seed")
    }
    assert(sawStuffed, "no test stream exercised FF 00 stuffing — widen the seeds")
  }

  test("4:4:4 color: decode returns the Y plane of the encoded RGB (3-component path)") {
    val w = 21; val h = 14
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 37 + (i / 3) * 11) % 256).toByte)
    val enc = JpegCodec.encodeColor(w, h, rgb)
    val dec = JpegCodec.decode(enc).get
    assert(dec.width == w && dec.height == h)
    var maxErr = 0
    for (j <- 0 until w * h) {
      val r = rgb(j * 3) & 0xFF; val g = rgb(j * 3 + 1) & 0xFF; val b = rgb(j * 3 + 2) & 0xFF
      val y = math.max(0, math.min(255,
        StrictMath.round(0.299 * r + 0.587 * g + 0.114 * b).toInt))
      maxErr = math.max(maxErr, math.abs((dec.pixels(j) & 0xFF) - y))
    }
    // one rounding step in the color transform + one in the DCT round-trip
    assert(maxErr <= 2, s"luma deviates by $maxErr")
  }

  test("subsampled (non-1x1) streams reject to None instead of mis-decoding") {
    val enc = JpegCodec.encodeColor(16, 16, Array.tabulate(16 * 16 * 3)(i => (i % 251).toByte))
    // patch component 1's sampling byte (0x11 -> 0x22) inside SOF0
    var i = 2
    var sof = -1
    while (sof < 0 && i + 4 < enc.length) {
      if ((enc(i) & 0xFF) == 0xFF && (enc(i + 1) & 0xFF) == 0xC0) sof = i
      else i += 1
    }
    assert(sof > 0)
    val patched = enc.clone()
    patched(sof + 11) = 0x22.toByte // [FF C0 len2 prec h2 w2 nf id1] -> sampling byte
    assert(JpegCodec.decode(patched).isEmpty)
  }

  test("flat images (pure-DC blocks, EOB-only ACs) round-trip exactly") {
    for (v <- Seq(0, 128, 255)) {
      val img = Image(16, 16, Array.fill(256)(v.toByte))
      val dec = JpegCodec.decode(JpegCodec.encodeGray(img)).get
      assert(dec.pixels.forall(b => (b & 0xFF) == v))
    }
  }
}
