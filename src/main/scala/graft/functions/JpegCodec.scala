package graft.functions

import java.io.ByteArrayOutputStream

/**
 * Baseline sequential JPEG (ITU-T T.81) with NO codec-library dependency —
 * the DCT sibling of [[PixelCodec]]'s PNG path: Huffman entropy coding,
 * zigzag run-length, FDCT/IDCT in doubles, marker-segment framing, restart
 * intervals, byte stuffing. Scope: 8-bit baseline DCT, grayscale (1
 * component) and 4:4:4 color (3 components, 1×1 sampling — the Y channel IS
 * the luma output); progressive / subsampled streams return None and fall to
 * the byte-level hash like any opaque payload.
 *
 * The ENCODER quantizes with unit tables (every divisor 1), so the bitstream
 * carries the FDCT coefficients exactly. That choice is what makes the
 * planted-oracle pattern work for a lossy format: two packagings of the same
 * pixels (different Huffman tables, restart intervals, metadata segments —
 * [[encodeGray]]'s `variant`) carry IDENTICAL coefficients and therefore
 * decode to IDENTICAL pixels, even though the DCT round-trip itself is not
 * exactly the original grid. Content identity lives at the coefficient
 * level, and the decode is a deterministic function of it.
 *
 * All trig goes through `StrictMath` so encode/decode agree bit-for-bit
 * across heterogeneous executors — on a 1000-node cluster the content digest
 * of a payload must not depend on which machine computed it.
 *
 * Extension component (no reference analogue): the reference pipeline treats
 * payloads as opaque bytes; pixel-space perceptual dedup is part of the
 * training-data toolkit this engine adds. Runs executor-side on byte arrays;
 * no Spark dependency in this file.
 */
object JpegCodec {
  import PixelCodec.Image

  // ------------------------------------------------------------ spec tables

  /** Zigzag index: natural position of the k-th coefficient in scan order. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Huffman table spec: `bits(l)` = number of codes of length l+1, then the
    * symbol values in code order — the (BITS, HUFFVAL) pair of T.81 Annex C. */
  final case class HuffSpec(bits: Array[Int], vals: Array[Int])

  // The four typical tables of T.81 Annex K.3 — the interchange-format
  // defaults every baseline codec ships.
  private val DcLum = HuffSpec(
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0),
    (0 to 11).toArray)
  private val DcChr = HuffSpec(
    Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0),
    (0 to 11).toArray)
  private val AcLum = HuffSpec(
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D),
    Array(
      0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
      0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
      0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
      0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
      0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
      0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
      0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
      0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
      0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
      0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
      0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
      0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
      0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
      0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA))
  private val AcChr = HuffSpec(
    Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77),
    Array(
      0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
      0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
      0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
      0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
      0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
      0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
      0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
      0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
      0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
      0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
      0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
      0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
      0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
      0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA))

  /** cosTable(u*8+x) = cos((2x+1)·u·π/16) — StrictMath for cross-executor
    * bit-determinism of the FDCT/IDCT. */
  private val Cos: Array[Double] = {
    val t = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var x = 0
      while (x < 8) {
        t(u * 8 + x) = StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0)
        x += 1
      }
      u += 1
    }
    t
  }
  private val InvSqrt2 = 1.0 / StrictMath.sqrt(2.0)

  // ----------------------------------------------------------------- DCT

  /** Forward 8×8 DCT-II with level shift, quantized by UNIT tables: output
    * is round(F(u,v)) in natural order, AC clamped to the baseline 10-bit
    * range (T.81 limits baseline AC to [-1023, 1023]; exact DCT of extreme
    * blocks can graze ±1024). */
  private def fdctQuant(px: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var sum = 0.0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            sum += (px(y * 8 + x) - 128) * Cos(v * 8 + x) * Cos(u * 8 + y)
            x += 1
          }
          y += 1
        }
        val cu = if (u == 0) InvSqrt2 else 1.0
        val cv = if (v == 0) InvSqrt2 else 1.0
        var q = StrictMath.round(0.25 * cu * cv * sum).toInt
        if (u != 0 || v != 0) q = math.max(-1023, math.min(1023, q))
        out(u * 8 + v) = q
        v += 1
      }
      u += 1
    }
    out
  }

  /** Inverse 8×8 DCT from dequantized coefficients (natural order), +128
    * level shift, clamped to [0, 255]. */
  private def idct(coef: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var sum = 0.0
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            val cu = if (u == 0) InvSqrt2 else 1.0
            val cv = if (v == 0) InvSqrt2 else 1.0
            sum += cu * cv * coef(u * 8 + v) * Cos(v * 8 + x) * Cos(u * 8 + y)
            v += 1
          }
          u += 1
        }
        val p = StrictMath.round(0.25 * sum).toInt + 128
        out(y * 8 + x) = math.max(0, math.min(255, p))
        x += 1
      }
      y += 1
    }
    out
  }

  // ------------------------------------------------------------- bit I/O

  /** MSB-first bit accumulator with JPEG byte stuffing (FF → FF 00) and
    * 1-padding on alignment (F.1.2.3). */
  private final class BitWriter(out: ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(bits: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((bits >>> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc & 0xFF)
          if ((acc & 0xFF) == 0xFF) out.write(0x00)
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def align(): Unit = if (nbits > 0) put(0xFF, 8 - nbits)
  }

  /** Entropy-segment bit reader: unstuffs FF 00, stops AT markers (a bare FF
    * followed by anything else), and resynchronizes across RSTn. */
  private final class BitReader(p: Array[Byte], start: Int) {
    private var i = start
    private var acc = 0
    private var nbits = 0
    var hitMarker = false

    private def fetch(): Boolean = {
      if (i >= p.length) return false
      val b = p(i) & 0xFF
      if (b == 0xFF) {
        if (i + 1 >= p.length) return false
        val nxt = p(i + 1) & 0xFF
        if (nxt == 0x00) { i += 2; acc = (acc << 8) | 0xFF; nbits += 8; true }
        else { hitMarker = true; false } // RSTn / EOI / next segment
      } else { i += 1; acc = (acc << 8) | b; nbits += 8; true }
    }

    /** Next bit, or -1 at a marker / end of data. */
    def bit(): Int = {
      if (nbits == 0 && !fetch()) return -1
      nbits -= 1
      (acc >>> nbits) & 1
    }

    /** `n`-bit big-endian field, or -1 if the stream ends first. */
    def bits(n: Int): Int = {
      var v = 0
      var k = 0
      while (k < n) {
        val b = bit()
        if (b < 0) return -1
        v = (v << 1) | b
        k += 1
      }
      v
    }

    /** Discard partial byte, consume an expected RSTn marker; false if the
      * stream is torn. `n` cycles 0..7. */
    def restart(n: Int): Boolean = {
      acc = 0; nbits = 0; hitMarker = false
      if (i + 1 >= p.length || (p(i) & 0xFF) != 0xFF || (p(i + 1) & 0xFF) != (0xD0 + n)) false
      else { i += 2; true }
    }
  }

  // ------------------------------------------------------------- Huffman

  /** Canonical code assignment (C.2): codes of ascending length, counting up. */
  private def huffCodes(spec: HuffSpec): Array[(Int, Int)] = { // value -> (code, len) dense by symbol order
    val codes = new Array[(Int, Int)](spec.vals.length)
    var code = 0
    var k = 0
    var l = 1
    while (l <= 16) {
      var c = 0
      while (c < spec.bits(l - 1)) {
        codes(k) = (code, l)
        code += 1; k += 1; c += 1
      }
      code <<= 1
      l += 1
    }
    codes
  }

  /** Encoder-side symbol → (code, len). */
  private def huffEnc(spec: HuffSpec): Array[Int] = {
    val table = Array.fill(256)(-1)
    val codes = huffCodes(spec)
    var k = 0
    while (k < spec.vals.length) {
      table(spec.vals(k)) = (codes(k)._2 << 16) | codes(k)._1
      k += 1
    }
    table
  }

  /** Decoder-side tables (F.15): mincode/maxcode/valptr per code length. */
  private final class HuffDecoder(spec: HuffSpec) {
    private val minCode = new Array[Int](17)
    private val maxCode = Array.fill(17)(-1)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (spec.bits(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += spec.bits(l - 1); k += spec.bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    /** Next symbol, or -1 on a torn stream. */
    def decode(r: BitReader): Int = {
      var code = r.bit()
      if (code < 0) return -1
      var l = 1
      while (l <= 16) {
        if (maxCode(l) >= 0 && code <= maxCode(l))
          return spec.vals(valPtr(l) + code - minCode(l))
        val b = r.bit()
        if (b < 0) return -1
        code = (code << 1) | b
        l += 1
      }
      -1
    }
  }

  /** EXTEND (F.12): map an s-bit magnitude field to its signed value. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Bit length of |v| — the SSSS category. */
  private def category(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  // ------------------------------------------------------------- encoder

  /**
   * Encode a grayscale image as a REAL baseline JPEG. Unit quantization
   * tables make the coefficients exact, so both variants decode to identical
   * pixels:
   *  - variant 0 (canonical): JFIF APP0, luminance Huffman tables, no
   *    restarts;
   *  - variant 1 (re-encoded): COM segment instead of APP0, CHROMINANCE
   *    Huffman tables (different codes for every symbol — the entropy bytes
   *    share nothing), restart interval 2 with RSTn resync markers.
   */
  def encodeGray(img: Image, variant: Int = 0): Array[Byte] = {
    require(variant == 0 || variant == 1, s"variant $variant")
    val (dcSpec, acSpec) = if (variant == 0) (DcLum, AcLum) else (DcChr, AcChr)
    val dcTab = huffEnc(dcSpec)
    val acTab = huffEnc(acSpec)
    val restartInterval = if (variant == 0) 0 else 2

    val out = new ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    def seg(m: Int, body: Array[Byte]): Unit = {
      marker(m)
      val len = body.length + 2
      out.write((len >>> 8) & 0xFF); out.write(len & 0xFF)
      out.write(body, 0, body.length)
    }

    marker(0xD8) // SOI
    if (variant == 0)
      seg(0xE0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    else
      seg(0xFE, "reencoded".getBytes("US-ASCII")) // COM
    // DQT: Pq=0 (8-bit), Tq=0, 64 unit divisors in zigzag order
    seg(0xDB, (0.toByte +: Array.fill(64)(1.toByte)).toArray)
    // SOF0: precision 8, dims, 1 component (id 1, 1x1 sampling, quant 0)
    seg(0xC0, Array[Byte](8,
      ((img.height >>> 8) & 0xFF).toByte, (img.height & 0xFF).toByte,
      ((img.width >>> 8) & 0xFF).toByte, (img.width & 0xFF).toByte,
      1, 1, 0x11, 0))
    // DHT: DC table class 0 id 0, AC table class 1 id 0
    seg(0xC4, (0.toByte +: (dcSpec.bits.map(_.toByte) ++ dcSpec.vals.map(_.toByte))).toArray)
    seg(0xC4, (0x10.toByte +: (acSpec.bits.map(_.toByte) ++ acSpec.vals.map(_.toByte))).toArray)
    if (restartInterval > 0)
      seg(0xDD, Array[Byte](((restartInterval >>> 8) & 0xFF).toByte, (restartInterval & 0xFF).toByte))
    // SOS: 1 component, DC/AC table 0, spectral 0..63, approx 0
    seg(0xDA, Array[Byte](1, 1, 0, 0, 63, 0))

    val bw = new BitWriter(out)
    val mcusX = (img.width + 7) / 8
    val mcusY = (img.height + 7) / 8
    val block = new Array[Int](64)
    var pred = 0
    var rstN = 0
    var mcu = 0
    var by = 0
    while (by < mcusY) {
      var bx = 0
      while (bx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.align()
          marker(0xD0 + rstN)
          rstN = (rstN + 1) % 8
          pred = 0
        }
        // edge-replicated 8x8 block
        var y = 0
        while (y < 8) {
          val sy = math.min(by * 8 + y, img.height - 1)
          var x = 0
          while (x < 8) {
            val sx = math.min(bx * 8 + x, img.width - 1)
            block(y * 8 + x) = img.pixels(sy * img.width + sx) & 0xFF
            x += 1
          }
          y += 1
        }
        val coef = fdctQuant(block)
        // DC difference
        val diff = coef(0) - pred
        pred = coef(0)
        val s = category(diff)
        val dc = dcTab(s)
        bw.put(dc & 0xFFFF, dc >>> 16)
        if (s > 0) bw.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
        // AC run-length
        var run = 0
        var k = 1
        while (k < 64) {
          val v = coef(Zigzag(k))
          if (v == 0) run += 1
          else {
            while (run > 15) { // ZRL
              val z = acTab(0xF0); bw.put(z & 0xFFFF, z >>> 16); run -= 16
            }
            val sz = category(v)
            val a = acTab((run << 4) | sz)
            bw.put(a & 0xFFFF, a >>> 16)
            bw.put(if (v >= 0) v else v + (1 << sz) - 1, sz)
            run = 0
          }
          k += 1
        }
        if (run > 0) { val e = acTab(0x00); bw.put(e & 0xFFFF, e >>> 16) } // EOB
        mcu += 1
        bx += 1
      }
      by += 1
    }
    bw.align()
    marker(0xD9) // EOI
    out.toByteArray
  }

  /**
   * Encode an interleaved-RGB image (3 bytes/px) as a baseline 4:4:4 color
   * JPEG: JFIF RGB→YCbCr (BT.601 full range), unit quant tables for both
   * planes, luminance Huffman tables for Y and chrominance tables for Cb/Cr,
   * one block of each component per MCU. Exists chiefly so the decoder's
   * 3-component path is exercised by a stream this codec itself produced —
   * [[decode]] returns the Y plane, which is the luma of the input.
   */
  def encodeColor(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"rgb ${rgb.length} != $w x $h x 3")
    val dcY = huffEnc(DcLum); val acY = huffEnc(AcLum)
    val dcC = huffEnc(DcChr); val acC = huffEnc(AcChr)

    // planar YCbCr, computed once (each plane is read 8x8-blockwise below)
    val n = w * h
    val py = new Array[Int](n); val pb = new Array[Int](n); val pr = new Array[Int](n)
    var j = 0
    while (j < n) {
      val r = rgb(j * 3) & 0xFF; val g = rgb(j * 3 + 1) & 0xFF; val b = rgb(j * 3 + 2) & 0xFF
      py(j) = clamp255(StrictMath.round(0.299 * r + 0.587 * g + 0.114 * b).toInt)
      pb(j) = clamp255(StrictMath.round(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0).toInt)
      pr(j) = clamp255(StrictMath.round(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0).toInt)
      j += 1
    }

    val out = new ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    def seg(m: Int, body: Array[Byte]): Unit = {
      marker(m)
      val len = body.length + 2
      out.write((len >>> 8) & 0xFF); out.write(len & 0xFF)
      out.write(body, 0, body.length)
    }
    marker(0xD8)
    seg(0xE0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    seg(0xDB, (0.toByte +: Array.fill(64)(1.toByte)).toArray) // table 0 (Y)
    seg(0xDB, (1.toByte +: Array.fill(64)(1.toByte)).toArray) // table 1 (C)
    seg(0xC0, Array[Byte](8,
      ((h >>> 8) & 0xFF).toByte, (h & 0xFF).toByte,
      ((w >>> 8) & 0xFF).toByte, (w & 0xFF).toByte,
      3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1))
    seg(0xC4, (0x00.toByte +: (DcLum.bits.map(_.toByte) ++ DcLum.vals.map(_.toByte))).toArray)
    seg(0xC4, (0x10.toByte +: (AcLum.bits.map(_.toByte) ++ AcLum.vals.map(_.toByte))).toArray)
    seg(0xC4, (0x01.toByte +: (DcChr.bits.map(_.toByte) ++ DcChr.vals.map(_.toByte))).toArray)
    seg(0xC4, (0x11.toByte +: (AcChr.bits.map(_.toByte) ++ AcChr.vals.map(_.toByte))).toArray)
    seg(0xDA, Array[Byte](3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))

    val bw = new BitWriter(out)
    val mcusX = (w + 7) / 8
    val mcusY = (h + 7) / 8
    val block = new Array[Int](64)
    val preds = new Array[Int](3)
    def encodeBlock(plane: Array[Int], by: Int, bx: Int, c: Int,
        dcTab: Array[Int], acTab: Array[Int]): Unit = {
      var y = 0
      while (y < 8) {
        val sy = math.min(by * 8 + y, h - 1)
        var x = 0
        while (x < 8) {
          val sx = math.min(bx * 8 + x, w - 1)
          block(y * 8 + x) = plane(sy * w + sx)
          x += 1
        }
        y += 1
      }
      val coef = fdctQuant(block)
      val diff = coef(0) - preds(c)
      preds(c) = coef(0)
      val s = category(diff)
      val dc = dcTab(s)
      bw.put(dc & 0xFFFF, dc >>> 16)
      if (s > 0) bw.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
      var run = 0
      var k = 1
      while (k < 64) {
        val v = coef(Zigzag(k))
        if (v == 0) run += 1
        else {
          while (run > 15) { val z = acTab(0xF0); bw.put(z & 0xFFFF, z >>> 16); run -= 16 }
          val sz = category(v)
          val a = acTab((run << 4) | sz)
          bw.put(a & 0xFFFF, a >>> 16)
          bw.put(if (v >= 0) v else v + (1 << sz) - 1, sz)
          run = 0
        }
        k += 1
      }
      if (run > 0) { val e = acTab(0x00); bw.put(e & 0xFFFF, e >>> 16) }
    }
    var by = 0
    while (by < mcusY) {
      var bx = 0
      while (bx < mcusX) {
        encodeBlock(py, by, bx, 0, dcY, acY)
        encodeBlock(pb, by, bx, 1, dcC, acC)
        encodeBlock(pr, by, bx, 2, dcC, acC)
        bx += 1
      }
      by += 1
    }
    bw.align()
    marker(0xD9)
    out.toByteArray
  }

  private def clamp255(v: Int): Int = math.max(0, math.min(255, v))

  // ------------------------------------------------------------- decoder

  private def be16(p: Array[Byte], i: Int): Int = ((p(i) & 0xFF) << 8) | (p(i + 1) & 0xFF)

  /**
   * Decode a baseline sequential JPEG to grayscale: marker-segment walk
   * (APPn/COM skipped, multi-table DQT/DHT, DRI), Huffman + RST-resync
   * entropy decode, dequantize, IDCT, Y-channel luma output. None for
   * anything outside baseline 1-component or 4:4:4 3-component 8-bit —
   * including the header-only payloads [[Multimodal.withBinaryPayload]]
   * synthesizes (no DHT/SOS follows their SOF0), which is what routes those
   * to the byte-level fallback hash.
   */
  def decode(p: Array[Byte]): Option[Image] = try {
    if (p.length < 4 || (p(0) & 0xFF) != 0xFF || (p(1) & 0xFF) != 0xD8) return None
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffDecoder](4)
    val acTabs = new Array[HuffDecoder](4)
    var w = -1; var h = -1
    var nComp = 0
    val compQuant = new Array[Int](3)
    val compDc = new Array[Int](3)
    val compAc = new Array[Int](3)
    var restartInterval = 0
    var i = 2
    var sosAt = -1

    while (sosAt < 0 && i + 4 <= p.length) {
      if ((p(i) & 0xFF) != 0xFF) return None
      val m = p(i + 1) & 0xFF
      if (m == 0xD8 || (m >= 0xD0 && m <= 0xD7)) { i += 2 } // bare markers
      else if (m == 0xD9) return None // EOI before SOS
      else {
        val len = be16(p, i + 2)
        if (len < 2 || i + 2L + len > p.length) return None
        val b0 = i + 4 // segment body start
        val bEnd = i + 2 + len
        m match {
          case 0xC0 | 0xC1 => // SOF0/SOF1 baseline-decodable frames
            if (p(b0) != 8) return None // precision
            h = be16(p, b0 + 1); w = be16(p, b0 + 3)
            nComp = p(b0 + 5) & 0xFF
            if (w <= 0 || h <= 0 || (nComp != 1 && nComp != 3)) return None
            var c = 0
            while (c < nComp) {
              val off = b0 + 6 + 3 * c
              if ((p(off + 1) & 0xFF) != 0x11) return None // 1x1 sampling only
              compQuant(c) = p(off + 2) & 0xFF
              c += 1
            }
          case 0xC2 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB | 0xCD | 0xCE | 0xCF =>
            return None // progressive / hierarchical / arithmetic
          case 0xDB => // DQT: one or more tables
            var q = b0
            while (q < bEnd) {
              val pq = (p(q) & 0xF0) >>> 4
              val tq = p(q) & 0x0F
              if (tq > 3) return None
              val t = new Array[Int](64)
              var k = 0
              if (pq == 0) {
                if (q + 65 > bEnd) return None
                while (k < 64) { t(k) = p(q + 1 + k) & 0xFF; k += 1 }
                q += 65
              } else {
                if (q + 129 > bEnd) return None
                while (k < 64) { t(k) = be16(p, q + 1 + 2 * k); k += 1 }
                q += 129
              }
              quant(tq) = t
            }
          case 0xC4 => // DHT: one or more tables
            var q = b0
            while (q < bEnd) {
              if (q + 17 > bEnd) return None
              val tc = (p(q) & 0xF0) >>> 4
              val th = p(q) & 0x0F
              if (tc > 1 || th > 3) return None
              val bits = Array.tabulate(16)(l => p(q + 1 + l) & 0xFF)
              val n = bits.sum
              if (q + 17 + n > bEnd || n > 256) return None
              val vals = Array.tabulate(n)(k => p(q + 17 + k) & 0xFF)
              val dec = new HuffDecoder(HuffSpec(bits, vals))
              if (tc == 0) dcTabs(th) = dec else acTabs(th) = dec
              q += 17 + n
            }
          case 0xDD => // DRI
            restartInterval = be16(p, b0)
          case 0xDA => // SOS
            val ns = p(b0) & 0xFF
            if (ns != nComp) return None
            var c = 0
            while (c < ns) {
              // components listed in frame order for the interleaves we accept
              compDc(c) = (p(b0 + 2 + 2 * c) & 0xF0) >>> 4
              compAc(c) = p(b0 + 2 + 2 * c) & 0x0F
              c += 1
            }
            sosAt = bEnd
          case _ => () // APPn, COM, others: skip
        }
        if (sosAt < 0) i = bEnd
      }
    }
    if (sosAt < 0 || w <= 0 || h <= 0) return None
    var c = 0
    while (c < nComp) {
      if (quant(compQuant(c)) == null || dcTabs(compDc(c)) == null || acTabs(compAc(c)) == null)
        return None
      c += 1
    }

    val r = new BitReader(p, sosAt)
    val mcusX = (w + 7) / 8
    val mcusY = (h + 7) / 8
    val luma = new Array[Byte](w * h)
    val preds = new Array[Int](3)
    val coef = new Array[Int](64)
    var rstN = 0
    var mcu = 0
    var by = 0
    while (by < mcusY) {
      var bx = 0
      while (bx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          if (!r.restart(rstN)) return None
          rstN = (rstN + 1) % 8
          java.util.Arrays.fill(preds, 0)
        }
        var c = 0
        while (c < nComp) {
          java.util.Arrays.fill(coef, 0)
          val qt = quant(compQuant(c))
          // DC
          val s = dcTabs(compDc(c)).decode(r)
          if (s < 0 || s > 15) return None
          val dv = if (s == 0) 0 else { val v = r.bits(s); if (v < 0) return None; extend(v, s) }
          preds(c) += dv
          coef(0) = preds(c) * qt(0)
          // AC
          var k = 1
          var done = false
          while (!done && k < 64) {
            val rs = acTabs(compAc(c)).decode(r)
            if (rs < 0) return None
            val run = rs >>> 4
            val sz = rs & 0x0F
            if (sz == 0) {
              if (run == 15) k += 16 // ZRL
              else done = true // EOB
            } else {
              k += run
              if (k > 63) return None
              val v = r.bits(sz)
              if (v < 0) return None
              coef(Zigzag(k)) = extend(v, sz) * qt(k)
              k += 1
            }
          }
          // Y channel is the luma output; Cb/Cr blocks are entropy-decoded
          // above purely to keep the bitstream position, no IDCT spent
          if (c == 0) {
            val px = idct(coef)
            var y = 0
            while (y < 8) {
              val sy = by * 8 + y
              if (sy < h) {
                var x = 0
                while (x < 8) {
                  val sx = bx * 8 + x
                  if (sx < w) luma(sy * w + sx) = px(y * 8 + x).toByte
                  x += 1
                }
              }
              y += 1
            }
          }
          c += 1
        }
        mcu += 1
        bx += 1
      }
      by += 1
    }
    Some(Image(w, h, luma))
  } catch { case _: Exception => None }
}
