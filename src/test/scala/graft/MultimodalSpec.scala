package graft

import org.apache.spark.sql.functions._

import graft.functions.Multimodal

/** Multimodal binary-column specs: sniffing, batched decode plumbing, and
  * perceptual-hash dedup on planted near-identical payloads. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = {
    val distinct = (0 until 12).map(i => (i.toLong, s"unique media item number $i with body content ${"x" * i}"))
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
}
