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
 *  - mime sniffing and byte accounting are pure column ops (codegen'd);
 *  - decoding is [[decodeBatched]]: `mapPartitions` with explicit batch
 *    grouping — the Scala analogue of the mapInPandas batch shape — so a
 *    real decoder amortizes model/codec setup per batch, not per row.
 *
 * DECODE IS STUBBED: this container has no image/audio codecs, so
 * [[stubDecoder]] derives deterministic fake dimensions from byte counts.
 * The Spark plumbing around it — schema, batching, partitioning, fingerprint
 * pairing — is real and tested; swap [[stubDecoder]] for a JNI/codec-backed
 * function to go live.
 */
object Multimodal {

  /** 8-byte magic prefixes used by the deterministic payload synthesizer and
    * recognized by [[sniffMime]]. */
  val PngMagic: Array[Byte] = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
  val JpegMagic: Array[Byte] = Array(0xFF, 0xD8, 0xFF, 0xE0, 0x00, 0x10, 0x4A, 0x46).map(_.toByte)
  val WavMagic: Array[Byte] = Array(0x52, 0x49, 0x46, 0x46, 0x00, 0x00, 0x00, 0x00).map(_.toByte)

  /**
   * Deterministic binary payloads for the documents plane: an 8-byte media
   * magic (cycled by doc id) followed by the UTF-8 text bytes. This is the
   * test-data adapter — a real pipeline ingests payload bytes from object
   * storage; everything downstream (sniff/meta/decode/dedup) is the real
   * path either way.
   */
  def withBinaryPayload(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val magic = when(col(idCol) % 3 === 0, lit(PngMagic))
      .when(col(idCol) % 3 === 1, lit(JpegMagic))
      .otherwise(lit(WavMagic))
    docs.withColumn("payload", concat(magic, encode(col(textCol), "UTF-8")))
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

  /** Typed metadata columns from the payload: mime + byte count via column
    * ops; dimensions via the STUB decode formulas (see [[stubDecoder]]) —
    * images get width/height, audio gets duration_ms. */
  def extractMeta(df: DataFrame, binCol: String = "payload"): DataFrame = {
    val n = length(col(binCol)).cast("bigint")
    val mime = sniffMime(col(binCol))
    df.withColumn("mime", mime)
      .withColumn("n_bytes", n)
      .withColumn("width",
        when(mime.startsWith("image/"), (lit(64) + n % 512).cast("int")))
      .withColumn("height",
        when(mime.startsWith("image/"), (lit(64) + (n * 7) % 512).cast("int")))
      .withColumn("duration_ms",
        when(mime === "audio/wav", n % 60000))
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

  /** STUB decoder — deterministic fake dimensions derived from byte counts
    * (the formulas [[extractMeta]] mirrors in column ops). A real
    * implementation decodes the payload with an image/audio codec here,
    * once per batch item, reusing codec state across the batch. */
  def stubDecoder(batch: Seq[(Long, Array[Byte])]): Seq[MediaMeta] =
    batch.map { case (id, payload) =>
      val mime = sniffMimeBytes(payload)
      val n = payload.length.toLong
      val isImage = mime.startsWith("image/")
      MediaMeta(
        doc_id = id,
        mime = mime,
        n_bytes = n,
        width = if (isImage) Some((64 + n % 512).toInt) else None,
        height = if (isImage) Some((64 + (n * 7) % 512).toInt) else None,
        duration_ms = if (mime == "audio/wav") Some(n % 60000) else None,
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
      decode: Seq[(Long, Array[Byte])] => Seq[MediaMeta] = stubDecoder): Dataset[MediaMeta] = {
    val narrowed = df.select(col(idCol).cast("long"), col(binCol))
    import narrowed.sparkSession.implicits._
    narrowed.as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(g => decode(g.toSeq)))
  }

  /** Perceptual near-dup pairs: decode (stub) → 64-bit phash → the shared
    * pigeonhole fingerprint pairing from Dedup. One shuffle on the block
    * key; no all-pairs product. */
  def phashPairs(docs: DataFrame, idCol: String = "doc_id",
      maxHamming: Int = 3, maxBucketSize: Int = 1000): DataFrame = {
    val metas = decodeBatched(docs, idCol)
    Dedup.fingerprintPairs(
      metas.select(col("doc_id").as("id"), col("phash").as("sh")),
      maxHamming, maxBucketSize)
  }
}
