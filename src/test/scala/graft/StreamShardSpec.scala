package graft

import org.apache.spark.sql.functions._

/**
 * X100s streaming shard emission: the drained streamed artifacts must carry
 * the same MEMBER plane as the batch tar writer on the same corpus (same
 * doc ids, byte lengths, payload md5s — nothing lost, duplicated, or
 * corrupted by per-batch sealing), and shard ids must be monotone in batch
 * order so earlier artifacts are never revisited.
 */
class StreamShardSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private lazy val streamed =
    SparkEntry.queries("d_stream_shard_write")(spark, dir)
      .as[(String, Long, Long, String)].collect()

  test("drained streamed members equal the batch writer's member plane") {
    val batch = SparkEntry.queries("d_shard_write")(spark, dir)
      .as[(String, Long, Long, String)].collect()
    // member plane = (doc_id, n_bytes, md5); shard grouping legitimately
    // differs (per-batch vs global packing) — content must not
    val sPlane = streamed.map { case (_, id, n, h) => (id, n, h) }.toSet
    val bPlane = batch.map { case (_, id, n, h) => (id, n, h) }.toSet
    assert(streamed.length == batch.length, "no member lost or duplicated")
    assert(sPlane == bPlane,
      s"member planes differ: onlyStream=${(sPlane -- bPlane).take(3)}, " +
        s"onlyBatch=${(bPlane -- sPlane).take(3)}")
  }

  test("shard ids are monotone per batch and batches never collide") {
    val packOf = streamed.map { case (f, id, _, _) =>
      val pack = f.replaceAll("^.*-([0-9]+)\\.tar$", "$1").toLong
      (id, pack)
    }
    packOf.foreach { case (id, pack) =>
      // batch membership is doc_id % 3; the monotone id scheme is
      // batchId * 100000 + within-batch pack — the file must carry it
      assert(pack / 100000 == id % 3,
        s"doc $id landed in pack $pack of the wrong batch window")
    }
    // every batch produced at least one sealed shard
    assert(packOf.map(_._2 / 100000).toSet == Set(0L, 1L, 2L))
  }
}
