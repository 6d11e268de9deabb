package graft.functions

/**
 * G.711 μ-law companding codec from the ITU-T spec — the audio sibling of
 * the from-scratch PNG/JPEG planes ([[PixelCodec]]/[[JpegCodec]]): no codec
 * library, executor-side byte arrays only.
 *
 * Encode: 14-bit magnitude + bias 33 (the 0x84-biased segmented
 * approximation of μ=255 log companding), segment = position of the top
 * set bit, 4-bit mantissa below it, sign in the MSB, whole byte inverted
 * on the wire. Decode is the exact inverse on the 256-point codebook.
 *
 * Lossiness discipline (the [[JpegCodec]] unit-quant move, transposed):
 * μ-law is 8-bit lossy over the 16-bit PCM domain, but DECODE∘ENCODE is the
 * identity ON THE CODEBOOK — synthesize planted audio from
 * [[MuLaw.decodeTable]] values and a μ-law re-encoding decodes
 * bit-identically, which closes the planted-oracle loop for a lossy format.
 *
 * WAV integration: format code 7 (ITU G.711 μ-law) in the fmt chunk, 8 bits
 * per sample; [[decodeWavSamples16]] normalizes every supported WAV flavor
 * to canonical 16-bit samples (PCM16 passthrough, μ-law expanded through
 * the codebook), so cross-format decoded-content identity is testable.
 */
object MuLaw {

  private val Bias = 0x84 // 132: the spec's bias before segmentation
  private val Clip = 32635

  /** One 16-bit sample → μ-law byte (sign | segment | mantissa, inverted). */
  def encode(sample: Short): Byte = {
    var s = sample.toInt
    val sign = if (s < 0) { s = -s; 0x80 } else 0
    if (s > Clip) s = Clip
    s += Bias
    // segment: index of the highest set bit above bit 7 (0..7)
    var seg = 7
    var probe = 0x4000
    while (seg > 0 && (s & probe) == 0) { seg -= 1; probe >>= 1 }
    val mantissa = (s >> (seg + 3)) & 0x0F
    (~(sign | (seg << 4) | mantissa) & 0xFF).toByte
  }

  /** μ-law byte → the 16-bit sample it denotes (exact codebook inverse). */
  def decode(b: Byte): Short = {
    val u = ~b & 0xFF
    val sign = u & 0x80
    val seg = (u >> 4) & 0x07
    val mantissa = u & 0x0F
    val magnitude = (((mantissa << 3) + Bias) << seg) - Bias
    (if (sign != 0) -magnitude else magnitude).toShort
  }

  /** The 256-point codebook, decodeTable(i) = decode of wire byte i. */
  lazy val decodeTable: Array[Short] =
    Array.tabulate(256)(i => decode(i.toByte))

  // ------------------------------------------------------------------- WAV

  private def le16(n: Int): Array[Byte] = Array((n & 0xFF).toByte, ((n >> 8) & 0xFF).toByte)
  private def le32(n: Long): Array[Byte] = Array((n & 0xFF).toByte,
    ((n >> 8) & 0xFF).toByte, ((n >> 16) & 0xFF).toByte, ((n >> 24) & 0xFF).toByte)

  /** Mono WAV, format 7 (μ-law), 8 bits/sample, from 16-bit samples. */
  def encodeWavMuLaw(samples: Array[Short], sampleRate: Int = 8000): Array[Byte] = {
    val data = samples.map(encode)
    val fmt = "fmt ".getBytes("US-ASCII") ++ le32(16) ++
      le16(7) ++ le16(1) ++ le32(sampleRate) ++ le32(sampleRate) ++ le16(1) ++ le16(8)
    val dataChunk = "data".getBytes("US-ASCII") ++ le32(data.length.toLong) ++ data
    val body = "WAVE".getBytes("US-ASCII") ++ fmt ++ dataChunk
    "RIFF".getBytes("US-ASCII") ++ le32(body.length.toLong) ++ body
  }

  /** Mono WAV, format 1 (PCM), 16 bits/sample, little-endian. */
  def encodeWavPcm16(samples: Array[Short], sampleRate: Int = 8000): Array[Byte] = {
    val data = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      data(2 * i) = (samples(i) & 0xFF).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = "fmt ".getBytes("US-ASCII") ++ le32(16) ++
      le16(1) ++ le16(1) ++ le32(sampleRate) ++ le32(sampleRate * 2L) ++ le16(2) ++ le16(16)
    val dataChunk = "data".getBytes("US-ASCII") ++ le32(data.length.toLong) ++ data
    val body = "WAVE".getBytes("US-ASCII") ++ fmt ++ dataChunk
    "RIFF".getBytes("US-ASCII") ++ le32(body.length.toLong) ++ body
  }

  /** Canonical 16-bit samples from any supported WAV flavor: PCM16
    * passthrough, μ-law (format 7) expanded through the codebook. None for
    * malformed payloads or flavors with no canonical mapping here. */
  def decodeWavSamples16(p: Array[Byte]): Option[Array[Short]] = try {
    def tag(off: Int): String =
      if (off + 4 <= p.length) new String(p, off, 4, "US-ASCII") else ""
    def u16(off: Int): Int = (p(off) & 0xFF) | (p(off + 1) & 0xFF) << 8
    if (p.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var fmtCode = -1
    var bits = -1
    var i = 12
    while (i + 8 <= p.length) {
      val size = ((p(i + 4) & 0xFFL) | (p(i + 5) & 0xFFL) << 8 |
        (p(i + 6) & 0xFFL) << 16 | (p(i + 7) & 0xFFL) << 24).toInt
      if (size < 0 || i + 8L + size > p.length) return None
      tag(i) match {
        case "fmt " if size >= 16 =>
          fmtCode = u16(i + 8)
          bits = u16(i + 22)
        case "data" =>
          val d = java.util.Arrays.copyOfRange(p, i + 8, i + 8 + size)
          return (fmtCode, bits) match {
            case (7, 8) => Some(d.map(b => decodeTable(b & 0xFF)))
            case (1, 16) if d.length % 2 == 0 =>
              Some(Array.tabulate(d.length / 2)(j =>
                ((d(2 * j) & 0xFF) | (d(2 * j + 1) << 8)).toShort))
            case _ => None
          }
        case _ => ()
      }
      i += 8 + size + (size & 1)
    }
    None
  } catch { case _: Exception => None }
}
