package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MuLaw

/**
 * G.711 μ-law codec contract: spec landmarks, exact codebook round-trip,
 * bounded quantization error, monotonicity, and the WAV integration —
 * PCM16 and μ-law encodings of codebook-aligned audio decode to IDENTICAL
 * canonical samples (the lossy-format planted-oracle closure).
 */
class AudioCodecSpec extends AnyFunSuite {

  test("spec landmarks: positive zero is 0xFF, max magnitude maps to segment 7") {
    assert((MuLaw.encode(0) & 0xFF) == 0xFF)
    assert(((MuLaw.encode(32767) & 0xFF) >> 4) == 0x8) // inverted seg-7 positive
    assert((MuLaw.encode(-32768) & 0x80) == 0) // wire MSB 0 after inversion = negative
    assert(MuLaw.decode(0xFF.toByte) == 0)
  }

  test("encode-of-decode is the identity on all wire bytes except negative zero") {
    for (b <- 0 until 256) {
      val round = MuLaw.encode(MuLaw.decode(b.toByte)) & 0xFF
      if (b == 0x7F) assert(round == 0xFF) // −0 collapses onto +0
      else assert(round == b, s"wire byte $b decoded to ${MuLaw.decode(b.toByte)} re-encoded $round")
    }
  }

  test("decode-of-encode error is bounded by half the segment step") {
    val r = new scala.util.Random(7L)
    for (_ <- 1 to 5000) {
      val x = (r.nextInt(2 * 32635 + 1) - 32635).toShort
      val y = MuLaw.decode(MuLaw.encode(x))
      val seg = {
        var s = math.abs(x.toInt) + 132
        var seg0 = 7; var probe = 0x4000
        while (seg0 > 0 && (s & probe) == 0) { seg0 -= 1; probe >>= 1 }
        seg0
      }
      val step = 1 << (seg + 3)
      assert(math.abs(y - x) <= step, s"x=$x y=$y step=$step")
    }
  }

  test("decode table is strictly monotone within each sign") {
    val pos = (0x80 until 0x100).map(b => MuLaw.decode(b.toByte)).reverse // 0xFF..0x80
    assert(pos == pos.sorted && pos.distinct.size == pos.size)
    val neg = (0x00 until 0x80).map(b => MuLaw.decode(b.toByte))
    assert(neg.drop(1) == neg.drop(1).sorted.reverse || neg.reverse == neg.reverse.sortBy(-_.toInt))
    assert(neg.forall(_ <= 0) && pos.forall(_ >= 0))
  }

  test("PCM16 and mu-law WAVs of codebook-aligned audio decode identically") {
    val r = new scala.util.Random(11L)
    val samples = Array.fill(500)(MuLaw.decodeTable(r.nextInt(256)))
    val pcm = MuLaw.encodeWavPcm16(samples)
    val ulaw = MuLaw.encodeWavMuLaw(samples)
    assert(pcm.length != ulaw.length) // genuinely different encodings
    val a = MuLaw.decodeWavSamples16(pcm).get
    val b = MuLaw.decodeWavSamples16(ulaw).get
    assert(a.toSeq == samples.toSeq)
    assert(b.toSeq == samples.toSeq) // lossy codec, lossless ON the codebook
  }

  test("decodeWavSamples16 rejects malformed and unsupported flavors") {
    assert(MuLaw.decodeWavSamples16(Array[Byte](1, 2, 3)).isEmpty)
    val good = MuLaw.encodeWavMuLaw(Array[Short](1, 2, 3))
    val truncated = good.take(good.length - 2)
    assert(MuLaw.decodeWavSamples16(truncated).isEmpty)
  }
}
