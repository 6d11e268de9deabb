package graft

import org.apache.spark.sql.functions._

import graft.functions.Multimodal

/** Multimodal binary-column specs: sniffing, batched decode plumbing, and
  * perceptual-hash dedup on planted near-identical payloads. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = {
    // strongly distinct bodies (per-id pseudo-random letters): with the
    // pixel-space hash, payloads of genuinely SIMILAR media are supposed to
    // pair — distinct fixtures must be distinct as media, not just as ids
    val distinct = (0 until 12).map { i =>
      // md5-derived gibberish: no shared prefix beyond "item N ", per-id
      // length (the trailing run) so tiled-sample phases decorrelate too
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(s"fixture-doc-$i".getBytes("UTF-8"))
      val noise = digest.map(b => ('a' + ((b & 0xFF) % 26)).toChar).mkString * 3
      (i.toLong, s"item $i $noise${"z" * i}")
    }
    // planted near-identical payloads (same magic: ids ≡ mod 3). SAME length:
    // near-identical real images share their dims, so the headers (which now
    // encode dims + CRC from the content length) must be identical too — the
    // edit is a one-character substitution, not an append.
    val planted = Seq(
      (99L, "a shared media payload body that is long enough to fingerprint stably across many shingles"),
      (102L, "a shared media payload body that is long enough to fingerprint stably across many shingleX"))
    (distinct ++ planted).toDF("doc_id", "text")
  }

  test("payload synthesis + mime sniffing agree with the magic cycle") {
    val out = Multimodal.extractMeta(Multimodal.withBinaryPayload(docs))
      .select("doc_id", "mime", "n_bytes").as[(Long, String, Long)].collect()
    out.foreach { case (id, mime, n) =>
      val expected = (id % 3) match {
        case 0 => "image/png"; case 1 => "image/jpeg"; case _ => "audio/wav"
      }
      assert(mime == expected, s"doc $id")
      assert(n >= 8)
    }
  }

  test("unknown magic falls back to application/octet-stream") {
    val weird = Seq((1L, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9))).toDF("doc_id", "payload")
    val mime = Multimodal.extractMeta(weird).select("mime").as[String].head()
    assert(mime == "application/octet-stream")
  }

  test("batched mapPartitions decode agrees with the column-op metadata") {
    val withBin = Multimodal.withBinaryPayload(docs)
    val colOps = Multimodal.extractMeta(withBin)
      .select("doc_id", "mime", "n_bytes", "width", "height", "duration_ms")
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val batched = Multimodal.decodeBatched(withBin, batchSize = 5)
      .select("doc_id", "mime", "n_bytes", "width", "height", "duration_ms")
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(colOps == batched)
  }

  test("image rows carry dims, audio rows carry duration") {
    val metas = Multimodal.decodeBatched(Multimodal.withBinaryPayload(docs)).collect()
    metas.foreach { m =>
      if (m.mime.startsWith("image/")) {
        assert(m.width.nonEmpty && m.height.nonEmpty && m.duration_ms.isEmpty)
      } else {
        assert(m.width.isEmpty && m.height.isEmpty && m.duration_ms.nonEmpty)
      }
    }
  }

  test("header round-trip: parsed dims/duration equal what the synthesizer encoded") {
    val metas = Multimodal.decodeBatched(Multimodal.withBinaryPayload(docs)).collect()
    val textLen = docs.select(col("doc_id"), length(encode(col("text"), "UTF-8")).cast("long"))
      .as[(Long, Long)].collect().toMap
    metas.foreach { m =>
      val L = textLen(m.doc_id)
      m.mime match {
        case "image/png" =>
          assert(m.n_bytes == L + Multimodal.PngHeaderBytes)
          assert(m.width.contains((64 + L % 512).toInt) && m.height.contains((64 + L * 7 % 512).toInt))
        case "image/jpeg" =>
          assert(m.n_bytes == L + Multimodal.JpegHeaderBytes)
          assert(m.width.contains((64 + L % 512).toInt) && m.height.contains((64 + L * 7 % 512).toInt))
        case "audio/wav" =>
          assert(m.n_bytes == L + Multimodal.WavHeaderBytes)
          assert(m.duration_ms.contains(L * 1000 / Multimodal.WavByteRate))
        case other => fail(s"unexpected mime $other")
      }
    }
  }

  test("PNG IHDR CRC in synthesized payloads is the genuine CRC-32") {
    val png = Multimodal.withBinaryPayload(docs).where(col("doc_id") % 3 === 0)
      .select("payload").as[Array[Byte]].head()
    val crc = new java.util.zip.CRC32
    crc.update(png, 12, 17) // chunk type "IHDR" + 13 data bytes
    val stored = ((png(29) & 0xFFL) << 24) | ((png(30) & 0xFFL) << 16) |
      ((png(31) & 0xFFL) << 8) | (png(32) & 0xFFL)
    assert(stored == crc.getValue)
  }

  test("JPEG marker scan parses non-canonical layouts the fixed-offset column path cannot") {
    // COM segment inserted between APP0 and SOF0 — real encoders do this
    val com = Array[Byte](0xFF.toByte, 0xFE.toByte, 0x00, 0x06) ++ "meta".getBytes("US-ASCII")
    val canonical = Multimodal.withBinaryPayload(docs).where(col("doc_id") === 1L)
      .select("payload").as[Array[Byte]].head()
    val shifted = canonical.take(20) ++ com ++ canonical.drop(20)
    assert(Multimodal.MediaHeaders.jpegDims(shifted) ===
      Multimodal.MediaHeaders.jpegDims(canonical))
    assert(Multimodal.MediaHeaders.jpegDims(canonical).nonEmpty)
    // the guarded column-op read nulls out instead of misreading
    val viaCols = Multimodal.extractMeta(
      Seq((1L, shifted)).toDF("doc_id", "payload"))
      .select("width").head()
    assert(viaCols.isNullAt(0))
  }

  test("WAV chunk walk tolerates an extra chunk before fmt/data") {
    val canonical = Multimodal.withBinaryPayload(docs).where(col("doc_id") === 2L)
      .select("payload").as[Array[Byte]].head()
    // insert a "LIST" chunk (size 4, word-aligned) right after "WAVE"
    val list = "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val shifted = canonical.take(12) ++ list ++ canonical.drop(12)
    assert(Multimodal.MediaHeaders.wavDurationMs(shifted) ===
      Multimodal.MediaHeaders.wavDurationMs(canonical))
    assert(Multimodal.MediaHeaders.wavDurationMs(canonical).nonEmpty)
  }

  test("phash pairs find planted near-identical payloads, not distinct ones") {
    val pairs = Multimodal.phashPairs(Multimodal.withBinaryPayload(docs), maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((99L, 102L)), s"got $pairs")
    assert(!pairs.exists { case (a, b) => a < 12 && b < 12 })
  }

  test("phash is stable and byte-local: small edit flips few bits") {
    val a = Multimodal.phashBytes("the quick brown fox jumps over the lazy dog again".getBytes("UTF-8"))
    val b = Multimodal.phashBytes("the quick brown fox jumps over the lazy dog again!".getBytes("UTF-8"))
    val c = Multimodal.phashBytes("completely different content with nothing shared at all".getBytes("UTF-8"))
    assert(java.lang.Long.bitCount(a ^ b) <= 3)
    assert(java.lang.Long.bitCount(a ^ c) > 10)
  }

  // ------------------------------------------------- pixel-space codecs

  import graft.functions.PixelCodec

  private def testImage(w: Int, h: Int, seed: Int): PixelCodec.Image = {
    // seed must change the STRUCTURE (gradients), not just add an offset —
    // dHash is (correctly) invariant to constant brightness shifts
    val px = Array.tabulate(w * h)(i =>
      ((i * (29 + 2 * seed) + (i / w) * (7 + 5 * seed) + seed * 97) % 256).toByte)
    PixelCodec.Image(w, h, px)
  }

  test("PNG round-trip: every spec filter, odd width, decodes to the encoded pixels") {
    for (filter <- 0 to 4) {
      val img = testImage(37, 23, filter) // odd width exercises edge columns
      val decoded = PixelCodec.decodePng(PixelCodec.encodePng(img, filterForRow = _ => filter))
      assert(decoded.nonEmpty, s"filter $filter")
      assert(decoded.get.width == 37 && decoded.get.height == 23)
      assert(decoded.get.pixels.sameElements(img.pixels), s"filter $filter")
    }
  }

  test("PNG re-encoding invariance: different filters, split IDAT, ancillary chunk — same pixels, same dHash") {
    val img = testImage(40, 30, 5)
    val canonical = PixelCodec.encodePng(img)
    val reencoded = PixelCodec.encodePng(img, filterForRow = y => 1 + y % 4,
      idatChunkSize = 100, ancillaryText = Some("alt"))
    // the payload BYTES are different; the decoded pixels are not
    assert(!canonical.sameElements(reencoded))
    val a = PixelCodec.decodePng(canonical).get
    val b = PixelCodec.decodePng(reencoded).get
    assert(a.pixels.sameElements(b.pixels))
    assert(PixelCodec.dHash64(a) == PixelCodec.dHash64(b))
    assert(Multimodal.contentDigest(canonical) == Multimodal.contentDigest(reencoded))
  }

  test("dHash is perceptual: local pixel edit flips few bits, different image flips many") {
    val img = testImage(45, 40, 1)
    val edited = img.copy(pixels = img.pixels.clone())
    var i = 0
    while (i < 20) { edited.pixels(i) = (~edited.pixels(i)).toByte; i += 1 } // one corner region
    val other = testImage(45, 40, 9)
    val h0 = PixelCodec.dHash64(img)
    assert(java.lang.Long.bitCount(h0 ^ PixelCodec.dHash64(edited)) <= 8)
    assert(java.lang.Long.bitCount(h0 ^ PixelCodec.dHash64(other)) > 10)
  }

  test("PNG color types 2/6 round-trip: byte-stride filters, luminance decode, alpha ignored") {
    val img = testImage(33, 21, 3) // odd width: edge pixels exercise the bpp stride
    val n = 33 * 21
    // RGB where r=g=b=gray: luminance must reproduce the grayscale exactly
    val rgb = new Array[Byte](n * 3)
    var i = 0
    while (i < n) { rgb(i * 3) = img.pixels(i); rgb(i * 3 + 1) = img.pixels(i); rgb(i * 3 + 2) = img.pixels(i); i += 1 }
    for (filter <- 0 to 4) {
      val decoded = PixelCodec.decodePng(
        PixelCodec.encodePngChannels(33, 21, colorType = 2, rgb, filterForRow = _ => filter))
      assert(decoded.nonEmpty, s"rgb filter $filter")
      assert(decoded.get.pixels.sameElements(img.pixels), s"rgb filter $filter")
    }
    // RGBA with a varying alpha channel: alpha must not perturb the luminance
    val rgba = new Array[Byte](n * 4)
    i = 0
    while (i < n) {
      rgba(i * 4) = img.pixels(i); rgba(i * 4 + 1) = img.pixels(i)
      rgba(i * 4 + 2) = img.pixels(i); rgba(i * 4 + 3) = ((i * 37) % 256).toByte
      i += 1
    }
    val decodedRgba = PixelCodec.decodePng(
      PixelCodec.encodePngChannels(33, 21, colorType = 6, rgba, filterForRow = _ => 4))
    assert(decodedRgba.nonEmpty && decodedRgba.get.pixels.sameElements(img.pixels))
    // the SAME image as grayscale and as RGB hashes identically — modality of
    // the ENCODING never separates perceptually identical content
    val asGray = PixelCodec.decodePng(PixelCodec.encodePng(img)).get
    assert(PixelCodec.dHash64(asGray) == PixelCodec.dHash64(decodedRgba.get))
  }

  test("header-only PNG payloads (no valid IDAT stream) decode to None, not garbage") {
    val headerOnly = Multimodal.withBinaryPayload(docs).where(col("doc_id") % 3 === 0)
      .select("payload").as[Array[Byte]].head()
    assert(PixelCodec.decodePng(headerOnly).isEmpty)
    assert(Multimodal.pixelPhash(headerOnly).isEmpty) // byte-fallback regime
  }

  test("WAV PCM decode survives an extra chunk before data; audio hash is sample-space") {
    val samples = Array.tabulate(500)(i => ((i * 13) % 256).toByte)
    val canonical = {
      val d = Multimodal.withRealPayload(Seq((1L, "x")).toDF("doc_id", "text")) // id 1 → wav
      d.select("payload").as[Array[Byte]].head()
    }
    assert(PixelCodec.decodeWavPcm(canonical).exists(_.sameElements("x".getBytes("UTF-8"))))
    // re-encoded variant: LIST chunk before fmt/data — same samples, same hash
    val v0 = Multimodal.withRealPayload(Seq((1L, "payload body")).toDF("doc_id", "text"), variant = 0)
      .select("payload").as[Array[Byte]].head()
    val v1 = Multimodal.withRealPayload(Seq((1L, "payload body")).toDF("doc_id", "text"), variant = 1)
      .select("payload").as[Array[Byte]].head()
    assert(!v0.sameElements(v1))
    assert(PixelCodec.decodeWavPcm(v0).get.sameElements(PixelCodec.decodeWavPcm(v1).get))
    assert(Multimodal.phashAny(v0) == Multimodal.phashAny(v1))
    assert(Multimodal.contentDigest(v0) == Multimodal.contentDigest(v1))
    // amplitude-local edit on a longer clip flips few envelope bits
    val a = PixelCodec.audioHash64(samples)
    val perturbed = samples.clone(); perturbed(100) = (perturbed(100) ^ 0x7F).toByte
    assert(java.lang.Long.bitCount(a ^ PixelCodec.audioHash64(perturbed)) <= 4)
  }

  test("phashAndDigest fuses phashAny + contentDigest bit-identically across modalities") {
    // one payload per regime: PNG (id 0 mod 4), JPEG (id 2 mod 4), WAV (odd),
    // both encoding variants, plus a header-only (no-decode) fallback payload
    val decodable = for {
      (id, text) <- Seq((4L, "png body text"), (2L, "jpeg body text"), (1L, "wav body text"))
      v <- Seq(0, 1)
    } yield Multimodal.withRealPayload(Seq((id, text)).toDF("doc_id", "text"), variant = v)
      .select("payload").as[Array[Byte]].head()
    val headerOnly = Multimodal.withBinaryPayload(Seq((0L, "hdr")).toDF("doc_id", "text"))
      .select("payload").as[Array[Byte]].head()
    (decodable :+ headerOnly).foreach { p =>
      val (h, d) = Multimodal.phashAndDigest(p)
      assert(h == Multimodal.phashAny(p))
      assert(Option(d) == Multimodal.contentDigest(p))
    }
  }

  test("PNG round-trip property: 60 seeded random images, dims 1..40, random per-row filters") {
    val rnd = new scala.util.Random(20260813L)
    (0 until 60).foreach { trial =>
      val w = 1 + rnd.nextInt(40); val h = 1 + rnd.nextInt(40)
      val px = Array.fill(w * h)(rnd.nextInt(256).toByte)
      val filters = Array.fill(h)(rnd.nextInt(5))
      val chunk = 1 + rnd.nextInt(200)
      val img = PixelCodec.Image(w, h, px)
      val decoded = PixelCodec.decodePng(PixelCodec.encodePng(img,
        filterForRow = filters(_), idatChunkSize = chunk,
        ancillaryText = if (trial % 2 == 0) Some(s"t$trial") else None))
      assert(decoded.nonEmpty, s"trial $trial ${w}x$h")
      assert(decoded.get.pixels.sameElements(px), s"trial $trial ${w}x$h filters=${filters.toSeq}")
    }
  }

  test("resizeBox: floor box means; resizeHalf agrees on even dims; constant stays constant") {
    val img = testImage(24, 16, 7)
    val half = PixelCodec.resizeHalf(img)
    assert(half.width == 12 && half.height == 8)
    assert(PixelCodec.resizeBox(img, 12, 8).pixels.sameElements(half.pixels))
    // hand-check one 2x2 box
    val p = img.pixels.map(_ & 0xFF)
    val expect00 = (p(0) + p(1) + p(24) + p(25)) / 4
    assert((half.pixels(0) & 0xFF) === expect00)
    val const = PixelCodec.Image(10, 10, Array.fill(100)(77.toByte))
    assert(PixelCodec.resizeBox(const, 3, 3).pixels.forall(b => (b & 0xFF) == 77))
    // uneven boxes cover everything: 7x5 -> 3x2 still averages all pixels
    val odd = testImage(7, 5, 2)
    val r = PixelCodec.resizeBox(odd, 3, 2)
    assert(r.width == 3 && r.height == 2)
  }

  test("decimate takes every k-th sample including the head") {
    val s = Array.tabulate(23)(_.toByte)
    val d = PixelCodec.decimate(s, 8)
    assert(d.toSeq === Seq[Byte](0, 8, 16))
    assert(PixelCodec.decimate(s, 1).toSeq === s.toSeq)
    assert(PixelCodec.decimate(Array.emptyByteArray, 4).isEmpty)
  }

  test("phashVerifiedPairs: re-encoded copies pair across variants, distinct media do not") {
    val base = docs.select(col("doc_id"), col("text"))
    val planted = base.where(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
    val corpus = Multimodal.withRealPayload(base, variant = 0)
      .unionByName(Multimodal.withRealPayload(planted, variant = 1))
    val pairs = Multimodal.phashVerifiedPairs(corpus)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // ids ≡ 0 (mod 5) in the fixture: 0,5,10,99(→ none: 99 % 5 ≠ 0),102 —
    // planted copies are 0,5,10 plus any fixture id divisible by 5
    val expected = Seq(0L, 5L, 10L).map(i => (i, i + 10000000L)).toSet
    assert(pairs == expected, s"got $pairs")
  }

  test("marker-scan batch decode reads real codec-JPEG dims; fixed-offset path nulls, not garbage") {
    val real = Multimodal.withRealPayload(
      Seq((2L, "dims come from the text byte count"), (6L, "x" * 48)).toDF("doc_id", "text"))
    def expectDims(id: Long): (Int, Int) = {
      val l = if (id == 2L) "dims come from the text byte count".length else 48
      (16 + l % 64, (16 + (7L * l) % 64).toInt)
    }
    // robust path: MediaHeaders.jpegDims marker scan finds SOF0 wherever the
    // codec put it (after JFIF APP0 + DQT here)
    Multimodal.decodeBatched(real).collect().foreach { m =>
      assert(m.mime == "image/jpeg")
      assert((m.width.get, m.height.get) == expectDims(m.doc_id),
        s"doc ${m.doc_id}: ${m.width}x${m.height}")
    }
    // fixed-offset column path: SOF0 is NOT at the canonical byte-21 slot of
    // the header-only synthesizer, so the guard must null dims, never
    // misread another segment's bytes as dimensions
    Multimodal.extractMeta(real).select("width", "height").collect()
      .foreach(r => assert(r.isNullAt(0) && r.isNullAt(1)))
  }

  test("JPEG modality: re-encoded copy lands at Hamming 0; same text as PNG does not pair") {
    // ids ≡ 2 (mod 4) are JPEG, ≡ 0 (mod 4) PNG — same text across the two
    // modalities must NOT pair (different decode, different digest prefix),
    // while the JPEG variant-1 re-encode of the same doc must pair exactly
    val text = "jpeg modality planted body with enough variation to fill several dct blocks"
    val corpus = Multimodal.withRealPayload(Seq((2L, text), (4L, text)).toDF("doc_id", "text"), variant = 0)
      .unionByName(Multimodal.withRealPayload(Seq((10000002L, text)).toDF("doc_id", "text"), variant = 1))
    val payloads = corpus.select("doc_id", "payload").as[(Long, Array[Byte])]
      .collect().toMap
    // modality routing: 2 → jpeg, 4 → png
    assert((payloads(2L)(0) & 0xFF) == 0xFF && (payloads(2L)(1) & 0xFF) == 0xD8)
    assert((payloads(4L)(0) & 0xFF) == 0x89)
    // the two jpeg encodings differ byte-wise but hash identically
    assert(!payloads(2L).sameElements(payloads(10000002L)))
    assert(Multimodal.pixelPhash(payloads(2L)).get ==
      Multimodal.pixelPhash(payloads(10000002L)).get)
    val pairs = Multimodal.phashVerifiedPairs(corpus)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((2L, 10000002L)), s"got $pairs")
  }
}
