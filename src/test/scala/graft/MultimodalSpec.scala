package graft

import org.apache.spark.sql.functions._

import graft.functions.Multimodal

/** Multimodal binary-column specs: sniffing, batched decode plumbing, and
  * perceptual-hash dedup on planted near-identical payloads. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = {
    val distinct = (0 until 12).map(i => (i.toLong, s"unique media item number $i with body content ${"x" * i}"))
    // planted near-identical payloads (same magic: ids ≡ mod 3)
    val planted = Seq(
      (99L, "a shared media payload body that is long enough to fingerprint stably across many shingles"),
      (102L, "a shared media payload body that is long enough to fingerprint stably across many shingles!"))
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
