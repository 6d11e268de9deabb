package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/**
 * Multimodal columns: images/audio/video as opaque `binary` payloads with
 * typed metadata, plus a perceptual-hash dedup hook that plugs into the
 * SimHash pair machinery.
 *
 * Spark-side design for 100 TB:
 *  - the payload is ONE binary column; metadata (mime/dims/bytes) lives in
 *    ordinary typed columns extracted once at ingest — queries filter and
 *    join on metadata without ever touching payload bytes (column pruning
 *    keeps the scan narrow);
 *  - mime sniffing, byte accounting AND header-field extraction (PNG IHDR
 *    dims, canonical-layout JPEG SOF0 dims, WAV byte-rate duration) are pure
 *    column ops (codegen'd substring/conv reads at the formats' documented
 *    offsets — no codec library involved);
 *  - [[decodeBatched]] is the general decoder: `mapPartitions` with explicit
 *    batch grouping — the Scala analogue of the mapInPandas batch shape —
 *    running [[MediaHeaders]]' real parsers (PNG signature+IHDR walk, JPEG
 *    marker scan, WAV RIFF chunk walk). Metadata decode is REAL; only
 *    pixel/sample decoding (which needs actual codecs this container lacks)
 *    would plug into the same per-batch hook.
 *
 * Test-data adapter: [[withBinaryPayload]] synthesizes payloads with REAL
 * headers — a parser that works here works on files produced by actual
 * encoders, because the header layouts are the formats' canonical ones
 * (PNG: signature + IHDR first chunk with a genuine CRC-32; JPEG:
 * SOI + APP0/JFIF + SOF0; WAV: the canonical 44-byte RIFF/PCM header).
 */
object Multimodal {

  // ------------------------------------------------------ header byte layout

  /** Byte-level header parsing/synthesis shared by the batched decoder and
    * the spec oracles. Pure JVM, no codec dependency — these are the
    * fixed-offset / chunk-walk reads the formats define. */
  object MediaHeaders {

    val PngSignature: Array[Byte] =
      Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

    private def be32(b: Array[Byte], off: Int): Long =
      ((b(off) & 0xFFL) << 24) | ((b(off + 1) & 0xFFL) << 16) |
        ((b(off + 2) & 0xFFL) << 8) | (b(off + 3) & 0xFFL)

    private def be16(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xFF) << 8) | (b(off + 1) & 0xFF)

    private def le32(b: Array[Byte], off: Int): Long =
      (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
        ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

    /** PNG dims: verify the 8-byte signature, then read the IHDR chunk —
      * which the spec requires to be FIRST, so width/height are the two
      * big-endian u32s at offsets 16 and 20 (after the 4-byte length and
      * "IHDR" type). */
    def pngDims(p: Array[Byte]): Option[(Int, Int)] =
      if (p.length >= 24 && p.take(8).sameElements(PngSignature) &&
        p(12) == 'I' && p(13) == 'H' && p(14) == 'D' && p(15) == 'R')
        Some((be32(p, 16).toInt, be32(p, 20).toInt))
      else None

    /** JPEG dims: the real marker scan — walk SOI, then each 0xFF-marker
      * segment (big-endian self-inclusive length) until a start-of-frame
      * marker (C0–CF except the non-frame C4/C8/CC), whose payload is
      * [precision u8][height u16][width u16]. Works on ANY segment layout,
      * not just the canonical APP0-first one the synthesizer emits. */
    def jpegDims(p: Array[Byte]): Option[(Int, Int)] = {
      if (p.length < 4 || (p(0) & 0xFF) != 0xFF || (p(1) & 0xFF) != 0xD8) return None
      var i = 2
      while (i + 3 < p.length && (p(i) & 0xFF) == 0xFF) {
        val marker = p(i + 1) & 0xFF
        if (marker >= 0xC0 && marker <= 0xCF && marker != 0xC4 && marker != 0xC8 && marker != 0xCC) {
          return if (i + 8 < p.length) Some((be16(p, i + 7), be16(p, i + 5))) else None
        }
        if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD9)) i += 2
        else i += 2 + be16(p, i + 2)
      }
      None
    }

    /** WAV duration: verify "RIFF"/"WAVE", then WALK the chunk list (id +
      * LE u32 size, word-aligned) for "fmt " (byte-rate at its offset 8) and
      * "data" (size field) — real RIFF traversal, robust to extra chunks
      * before either. duration_ms = dataSize * 1000 / byteRate. */
    def wavDurationMs(p: Array[Byte]): Option[Long] = {
      def tag(off: Int): String =
        if (off + 4 <= p.length) new String(p, off, 4, "US-ASCII") else ""
      if (p.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
      var byteRate = -1L
      var dataSize = -1L
      var i = 12
      while (i + 8 <= p.length && (byteRate < 0 || dataSize < 0)) {
        val id = tag(i)
        val size = le32(p, i + 4)
        if (id == "fmt " && i + 16 <= p.length) byteRate = le32(p, i + 16)
        if (id == "data") dataSize = size
        i += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
      }
      if (byteRate > 0 && dataSize >= 0) Some(dataSize * 1000L / byteRate) else None
    }
  }

  /** 8-byte magic prefixes recognized by [[sniffMime]] (the JPEG/WAV entries
    * match the canonical headers the synthesizer emits). */
  val PngMagic: Array[Byte] = MediaHeaders.PngSignature

  /** WAV synthesis parameters: 8 kHz mono 8-bit PCM → byteRate 8000, so
    * duration_ms = dataBytes * 1000 / 8000. */
  val WavByteRate: Long = 8000L
  /** Header sizes the synthesizer produces (PNG: signature + IHDR chunk;
    * JPEG: SOI + APP0 + SOF0; WAV: the canonical 44-byte header). */
  val PngHeaderBytes: Int = 33
  val JpegHeaderBytes: Int = 39
  val WavHeaderBytes: Int = 44

  // little-endian u32 as 8 hex chars (for the RIFF fields)
  private def le32Hex(n: Column): Column = concat(
    lpad(hex(n % 256), 2, "0"),
    lpad(hex((n.cast("bigint") / 256).cast("bigint") % 256), 2, "0"),
    lpad(hex((n.cast("bigint") / 65536).cast("bigint") % 256), 2, "0"),
    lpad(hex((n.cast("bigint") / 16777216).cast("bigint") % 256), 2, "0"))

  /**
   * Deterministic binary payloads with REAL headers for the documents plane
   * (cycled by doc id: PNG / JPEG / WAV), followed by the UTF-8 text bytes
   * standing in for the compressed pixel/sample stream. Dimensions and
   * duration derive deterministically from the text byte length L — width =
   * 64 + L mod 512, height = 64 + 7L mod 512, WAV data size = L at byte rate
   * 8000 — so a SQL oracle can recompute what a parser must read back out of
   * the header bytes. Everything here is codegen'd column ops, including the
   * genuine IHDR CRC-32 (Spark's crc32 over the chunk type + data).
   */
  def withBinaryPayload(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val text = encode(col(textCol), "UTF-8")
    val L = length(text).cast("bigint")
    val w = lit(64L) + L % 512
    val h = lit(64L) + (L * 7) % 512

    // PNG: signature + IHDR(len=13, w u32, h u32, bit depth 8, color type 6
    // (RGBA), compression/filter/interlace 0) + real CRC over type+data.
    val ihdrBody = concat(lit("49484452"),
      lpad(hex(w), 8, "0"), lpad(hex(h), 8, "0"), lit("0806000000"))
    val pngHeader = concat(lit("89504E470D0A1A0A"), lit("0000000D"),
      ihdrBody, lpad(hex(crc32(unhex(ihdrBody))), 8, "0"))

    // JPEG: SOI + APP0/JFIF (v1.1, no thumbnail) + SOF0 (8-bit, 3 components
    // 4:2:0) carrying height then width as big-endian u16.
    val jpegHeader = concat(
      lit("FFD8"),
      lit("FFE000104A46494600010100000100010000"),
      lit("FFC0001108"), lpad(hex(h), 4, "0"), lpad(hex(w), 4, "0"),
      lit("03012200021101031101"))

    // WAV: the canonical 44-byte header — RIFF size 36+L, PCM fmt chunk
    // (mono, 8 kHz, 8-bit → byteRate 8000, blockAlign 1), data size L.
    val wavHeader = concat(
      lit("52494646"), le32Hex(L + 36), lit("57415645"),
      lit("666D7420"), lit("10000000"), lit("0100"), lit("0100"),
      le32Hex(lit(WavByteRate)), le32Hex(lit(WavByteRate)), lit("0100"), lit("0800"),
      lit("64617461"), le32Hex(L))

    val header = when(col(idCol) % 3 === 0, pngHeader)
      .when(col(idCol) % 3 === 1, jpegHeader)
      .otherwise(wavHeader)
    docs.withColumn("payload", concat(unhex(header), text))
  }

  /** Mime type from payload magic bytes (first 4 bytes; codegen'd hex
    * compare, no UDF). Unknown magics → application/octet-stream. */
  def sniffMime(payload: Column): Column = {
    val h4 = hex(substring(payload, 1, 4))
    when(h4 === "89504E47", "image/png")
      .when(h4.startsWith("FFD8FF"), "image/jpeg")
      .when(h4 === "52494646", "audio/wav")
      .otherwise("application/octet-stream")
  }

  // big-endian uint read as a bigint column (substring offsets are 1-based)
  private def beUint(payload: Column, off: Int, len: Int): Column =
    conv(hex(substring(payload, off, len)), 16, 10).cast("bigint")

  // little-endian u32 read: reverse the 4 bytes, then conv
  private def leUint32(payload: Column, off: Int): Column =
    conv(concat(hex(substring(payload, off + 3, 1)), hex(substring(payload, off + 2, 1)),
      hex(substring(payload, off + 1, 1)), hex(substring(payload, off, 1))), 16, 10)
      .cast("bigint")

  /**
   * Typed metadata columns from the payload, decoded from the REAL header
   * bytes via codegen'd column ops:
   *  - PNG: width/height = the IHDR u32s (guarded on the chunk type actually
   *    being "IHDR" at its spec-mandated first position);
   *  - JPEG: the SOF0 u16s at the canonical APP0-first layout's offset,
   *    guarded on the FFC0 marker being there — non-canonical segment layouts
   *    yield null here and are handled by [[decodeBatched]]'s marker scan;
   *  - WAV: duration_ms = data size × 1000 / byte rate, both read
   *    little-endian from the canonical 44-byte header (guarded on "data" at
   *    offset 37); non-canonical chunk orders fall to the batched chunk walk.
   */
  def extractMeta(df: DataFrame, binCol: String = "payload"): DataFrame = {
    val p = col(binCol)
    val mime = sniffMime(p)
    val pngOk = hex(substring(p, 13, 4)) === "49484452" // "IHDR"
    val jpegSofOk = hex(substring(p, 21, 2)) === "FFC0"
    val wavOk = hex(substring(p, 37, 4)) === "64617461" // "data"
    val wavByteRate = leUint32(p, 29)
    val wavDataSize = leUint32(p, 41)
    df.withColumn("mime", mime)
      .withColumn("n_bytes", length(p).cast("bigint"))
      .withColumn("width",
        when(mime === "image/png" && pngOk, beUint(p, 17, 4))
          .when(mime === "image/jpeg" && jpegSofOk, beUint(p, 28, 2)).cast("int"))
      .withColumn("height",
        when(mime === "image/png" && pngOk, beUint(p, 21, 4))
          .when(mime === "image/jpeg" && jpegSofOk, beUint(p, 26, 2)).cast("int"))
      .withColumn("duration_ms",
        when(mime === "audio/wav" && wavOk && wavByteRate > 0,
          wavDataSize * 1000 / wavByteRate).cast("bigint"))
  }

  /** Decoded per-item record (what a real decoder would emit). */
  final case class MediaMeta(
      doc_id: Long,
      mime: String,
      n_bytes: Long,
      width: Option[Int],
      height: Option[Int],
      duration_ms: Option[Long],
      phash: Long)

  implicit val mediaMetaEncoder: Encoder[MediaMeta] = Encoders.product[MediaMeta]

  private def sniffMimeBytes(payload: Array[Byte]): String =
    if (payload.length >= 4 && payload(0) == 0x89.toByte && payload(1) == 0x50.toByte &&
      payload(2) == 0x4E.toByte && payload(3) == 0x47.toByte) "image/png"
    else if (payload.length >= 3 && payload(0) == 0xFF.toByte && payload(1) == 0xD8.toByte &&
      payload(2) == 0xFF.toByte) "image/jpeg"
    else if (payload.length >= 4 && payload(0) == 'R' && payload(1) == 'I' &&
      payload(2) == 'F' && payload(3) == 'F') "audio/wav"
    else "application/octet-stream"

  /** 64-bit perceptual hash over the payload: SimHash of overlapping 4-byte
    * shingles (FNV-1a shingle hashes, majority vote per bit). Byte-local
    * edits flip few bits, so near-identical payloads land within small
    * Hamming distance — the property [[phashPairs]] blocks on. */
  def phashBytes(payload: Array[Byte]): Long = {
    val votes = new Array[Int](64)
    var i = 0
    val n = math.max(payload.length - 3, 0)
    while (i < n) {
      // FNV-1a over the 4-byte window
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < 4) { h ^= (payload(i + j) & 0xFF).toLong; h *= 0x100000001b3L; j += 1 }
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) != 0L) votes(bit) += 1 else votes(bit) -= 1
        bit += 1
      }
      i += 1
    }
    var fp = 0L
    var bit = 0
    while (bit < 64) { if (votes(bit) > 0) fp |= (1L << bit); bit += 1 }
    fp
  }

  /** Header decoder — REAL byte parsing per batch item: PNG signature + IHDR
    * read, JPEG marker scan, WAV RIFF chunk walk ([[MediaHeaders]]). A
    * pixel/sample decoder (needs actual codecs) would extend this same
    * per-batch hook, reusing codec state across the batch. */
  def headerDecoder(batch: Seq[(Long, Array[Byte])]): Seq[MediaMeta] =
    batch.map { case (id, payload) =>
      val mime = sniffMimeBytes(payload)
      val dims = mime match {
        case "image/png" => MediaHeaders.pngDims(payload)
        case "image/jpeg" => MediaHeaders.jpegDims(payload)
        case _ => None
      }
      MediaMeta(
        doc_id = id,
        mime = mime,
        n_bytes = payload.length.toLong,
        width = dims.map(_._1),
        height = dims.map(_._2),
        duration_ms = if (mime == "audio/wav") MediaHeaders.wavDurationMs(payload) else None,
        phash = phashBytes(payload))
    }

  /**
   * Batched decode over the payload column: each task walks its partition in
   * `batchSize` groups and hands the batch to `decode` — the mapInPandas
   * batch shape, in Scala. The decoder runs executor-side; nothing collects
   * to the driver.
   */
  def decodeBatched(
      df: DataFrame,
      idCol: String = "doc_id",
      binCol: String = "payload",
      batchSize: Int = 64,
      decode: Seq[(Long, Array[Byte])] => Seq[MediaMeta] = headerDecoder): Dataset[MediaMeta] = {
    val narrowed = df.select(col(idCol).cast("long"), col(binCol))
    import narrowed.sparkSession.implicits._
    narrowed.as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(g => decode(g.toSeq)))
  }

  // --------------------------------------------------- pixel-space payloads

  /** Real-payload modality cycle: odd ids → WAV; even ids split PNG
    * (id ≡ 0 mod 4) / JPEG (id ≡ 2 mod 4). Keyed mod 4 so the planted-copy
    * id offset (+10,000,000 ≡ 0 mod 4) preserves each document's modality —
    * every oracle that states "same modality" survives the plant. JPEG
    * joined the pixel-space set in round 8 ([[JpegCodec]]); nothing falls to
    * the byte hash here anymore. */
  private def realMime(docId: Long): String =
    if (docId % 2 != 0) "audio/wav"
    else if (docId % 4 == 0) "image/png"
    else "image/jpeg"

  /** Deterministic grayscale pixels from the text bytes: dims derive from the
    * byte count (w = 16 + L mod 64, h = 16 + 7L mod 64), pixel i = text[i mod
    * L] XOR (31·i mod 256). The XOR term varies only with POSITION, so pixel
    * equality ⟺ text equality (given equal dims, which equal L forces) —
    * that injectivity is what lets a SQL oracle state pair ground truth as
    * text equality — while breaking the constant-row degeneracy tiling alone
    * would give short texts (whose pooled dHash cells would all tie). */
  private[functions] def pixelsFromText(text: Array[Byte]): PixelCodec.Image = {
    val l = text.length
    val w = (16 + l % 64); val h = (16 + (7L * l % 64)).toInt
    val px = new Array[Byte](w * h)
    var i = 0
    while (i < px.length) {
      val t = if (l == 0) 0 else text(i % l) & 0xFF
      px(i) = (t ^ ((31 * i) & 0xFF)).toByte
      i += 1
    }
    PixelCodec.Image(w, h, px)
  }

  /**
   * Fully-real payloads (decodable pixel/sample content, not just headers),
   * deterministic from (doc id, text). Two encoding variants that decode to
   * IDENTICAL content for identical text:
   *  - variant 0 (canonical): PNG with filter None + one IDAT; JPEG with
   *    JFIF APP0 + luminance Huffman tables; WAV with the canonical 44-byte
   *    header;
   *  - variant 1 (re-encoded): PNG with per-row Sub/Up/Average/Paeth filters,
   *    IDAT split into 257-byte chunks (splits mid-scanline) and a tEXt chunk
   *    before IDAT; JPEG with a COM segment, CHROMINANCE Huffman tables and
   *    restart-interval-2 RSTn markers (unit quant tables carry the
   *    coefficients exactly, so the re-encode is pixel-identical — see
   *    [[JpegCodec.encodeGray]]); WAV with a LIST chunk inserted before data.
   * Byte-level, the two variants share almost nothing; pixel-level they are
   * the same item — the contrast [[phashPairs]]' pixel path must bridge and
   * the byte-fallback hash cannot.
   */
  def withRealPayload(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", variant: Int = 0): DataFrame = {
    require(variant == 0 || variant == 1, s"variant $variant")
    val narrowed = docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
    import narrowed.sparkSession.implicits._
    narrowed.as[(Long, String)].map { case (id, text) =>
      val bytes = Option(text).getOrElse("").getBytes("UTF-8")
      val payload = realMime(id) match {
        case "image/png" =>
          val img = pixelsFromText(bytes)
          if (variant == 0) PixelCodec.encodePng(img)
          else PixelCodec.encodePng(img, filterForRow = y => 1 + y % 4,
            idatChunkSize = 257, ancillaryText = Some("reencoded"))
        case "image/jpeg" =>
          JpegCodec.encodeGray(pixelsFromText(bytes), variant)
        case _ =>
          val extra =
            if (variant == 0) Array.emptyByteArray
            else "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
          wavPayload(bytes, extra)
      }
      (id, text, payload)
    }.toDF("doc_id", "text", "payload")
  }

  /** Canonical RIFF/WAVE PCM bytes (mono 8 kHz 8-bit, the [[WavByteRate]]
    * layout) with `extraChunk` inserted between "WAVE" and the fmt chunk. */
  private def wavPayload(samples: Array[Byte], extraChunk: Array[Byte]): Array[Byte] = {
    def le32(n: Long): Array[Byte] =
      Array((n & 0xFF).toByte, ((n >> 8) & 0xFF).toByte, ((n >> 16) & 0xFF).toByte, ((n >> 24) & 0xFF).toByte)
    val fmt = "fmt ".getBytes("US-ASCII") ++ le32(16) ++
      Array[Byte](1, 0, 1, 0) ++ le32(WavByteRate) ++ le32(WavByteRate) ++ Array[Byte](1, 0, 8, 0)
    val data = "data".getBytes("US-ASCII") ++ le32(samples.length.toLong) ++ samples
    val body = "WAVE".getBytes("US-ASCII") ++ extraChunk ++ fmt ++ data
    "RIFF".getBytes("US-ASCII") ++ le32(body.length.toLong) ++ body
  }

  /** Pixel/sample-space perceptual hash where the payload decodes (PNG/JPEG
    * → dHash over the decoded pixel grid, WAV → PCM energy-envelope hash);
    * None where it doesn't (octet-stream, progressive/subsampled JPEG,
    * header-only or corrupt payloads). */
  def pixelPhash(payload: Array[Byte]): Option[Long] = sniffMimeBytes(payload) match {
    case "image/png" => PixelCodec.decodePng(payload).map(PixelCodec.dHash64)
    case "image/jpeg" => JpegCodec.decode(payload).map(PixelCodec.dHash64)
    case "audio/wav" => PixelCodec.decodeWavPcm(payload).map(PixelCodec.audioHash64)
    case _ => None
  }

  /** The hash [[phashPairs]] blocks on: pixel-space where decodable, the
    * byte-shingle SimHash fallback otherwise — so octet-stream payloads keep
    * byte-near-dup pairing while decodable media gets true perceptual
    * (re-encoding-invariant) pairing. */
  def phashAny(payload: Array[Byte]): Long =
    pixelPhash(payload).getOrElse(phashBytes(payload))

  /** MD5 digest of the DECODED canonical content (mime + dims + pixel bytes
    * for PNG, mime + PCM bytes for WAV; None where no decode exists) —
    * encoding-invariant exact identity, the verify key behind
    * [[phashVerifiedPairs]]. */
  def contentDigest(payload: Array[Byte]): Option[String] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
    sniffMimeBytes(payload) match {
      case "image/png" => PixelCodec.decodePng(payload).map { img =>
        md.update(s"png:${img.width}x${img.height}:".getBytes("US-ASCII"))
        md.update(img.pixels)
        hex(md.digest())
      }
      // JPEG digests the DECODED pixels too: the unit-quant coefficients are
      // a deterministic function of the source grid, so same text → same
      // decode exactly; and the mime prefix keeps a JPEG from pairing with
      // the PNG of the same text (whose pixels differ by the DCT round-trip
      // anyway — distinct-text collisions would need every 8×8 block of two
      // different grids to round to identical coefficient sets, which the
      // position-XOR pixel synthesis makes structurally implausible).
      case "image/jpeg" => JpegCodec.decode(payload).map { img =>
        md.update(s"jpeg:${img.width}x${img.height}:".getBytes("US-ASCII"))
        md.update(img.pixels)
        hex(md.digest())
      }
      case "audio/wav" => PixelCodec.decodeWavPcm(payload).map { pcm =>
        md.update("wav:".getBytes("US-ASCII")); md.update(pcm)
        hex(md.digest())
      }
      case _ => None
    }
  }

  /** Perceptual near-dup pairs: pixel-space phash where the payload decodes
    * (re-encoding-invariant), byte-shingle fallback otherwise → the shared
    * pigeonhole fingerprint pairing from Dedup. One shuffle on the block
    * key; no all-pairs product; the hash plane computes ONCE per row
    * executor-side. */
  def phashPairs(docs: DataFrame, idCol: String = "doc_id", binCol: String = "payload",
      maxHamming: Int = 3, maxBucketSize: Int = 1000): DataFrame = {
    val narrowed = docs.select(col(idCol).cast("long"), col(binCol))
    import narrowed.sparkSession.implicits._
    val hashed = narrowed.as[(Long, Array[Byte])]
      .map { case (id, p) => (id, phashAny(p)) }.toDF("id", "sh")
    Dedup.fingerprintPairs(hashed, maxHamming, maxBucketSize)
  }

  /** One-decode fusion of [[phashAny]] + [[contentDigest]] (r16): the two
    * were computed as separate calls in [[phashVerifiedPairs]]' hash plane,
    * decoding every payload TWICE (PNG inflate / JPEG DCT / WAV chunk walk
    * are the dominant per-row cost). Same decoders, same success conditions,
    * same digest preimage — output is bit-identical to the unfused pair;
    * digest is null exactly where [[contentDigest]] returned None. */
  def phashAndDigest(payload: Array[Byte]): (Long, String) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
    sniffMimeBytes(payload) match {
      case "image/png" => PixelCodec.decodePng(payload) match {
        case Some(img) =>
          md.update(s"png:${img.width}x${img.height}:".getBytes("US-ASCII"))
          md.update(img.pixels)
          (PixelCodec.dHash64(img), hex(md.digest()))
        case None => (phashBytes(payload), null)
      }
      case "image/jpeg" => JpegCodec.decode(payload) match {
        case Some(img) =>
          md.update(s"jpeg:${img.width}x${img.height}:".getBytes("US-ASCII"))
          md.update(img.pixels)
          (PixelCodec.dHash64(img), hex(md.digest()))
        case None => (phashBytes(payload), null)
      }
      case "audio/wav" => PixelCodec.decodeWavPcm(payload) match {
        case Some(pcm) =>
          md.update("wav:".getBytes("US-ASCII")); md.update(pcm)
          (PixelCodec.audioHash64(pcm), hex(md.digest()))
        case None => (phashBytes(payload), null)
      }
      case _ => (phashBytes(payload), null)
    }
  }

  /**
   * Perceptual candidates verified to EXACT decoded-content identity: the
   * pigeonhole phash join supplies recall (identical content → identical
   * pixel hash → Hamming 0 → blocked together), the [[contentDigest]]
   * equi-check supplies exact precision. The result is oracle-comparable
   * ground truth — for [[withRealPayload]] corpora, decoded-content equality
   * is text equality by construction, which a SQL oracle can state directly.
   * Payloads with no decode (no digest) never verify; they belong to
   * [[phashPairs]]' approximate byte-level regime.
   */
  def phashVerifiedPairs(docs: DataFrame, idCol: String = "doc_id",
      binCol: String = "payload", maxHamming: Int = 3, maxBucketSize: Int = 1000): DataFrame = {
    val narrowed = docs.select(col(idCol).cast("long"), col(binCol))
    import narrowed.sparkSession.implicits._
    // One executor-side pass computes hash + digest — payloads DECODE ONCE
    // ([[phashAndDigest]]); both consumers (the blocking join and the
    // verify) read this cached plane — payload bytes are never shuffled,
    // only (id, 64-bit hash, 32-char digest).
    val plane = narrowed.as[(Long, Array[Byte])]
      .map { case (id, p) => val (h, d) = phashAndDigest(p); (id, h, d) }
      .toDF("id", "sh", "digest")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val result = Dedup.fingerprintPairs(plane.select("id", "sh"), maxHamming, maxBucketSize)
      .join(plane.select(col("id").as("id_a"), col("digest").as("da")), Seq("id_a"))
      .join(plane.select(col("id").as("id_b"), col("digest").as("db")), Seq("id_b"))
      .where(col("da").isNotNull && col("da") === col("db"))
      .select(col("id_a"), col("id_b"))
      .localCheckpoint(true)
    plane.unpersist()
    result
  }
}
