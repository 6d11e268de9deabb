package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.codec.TarCodec

/**
 * Training-shard artifact writer/reader — the stage the packing plane
 * (X15 packSequences / X50 carveContextWindows) feeds but r≤14 never
 * materialized: the WebDataset-shape tar shards a trainer's data loader
 * actually consumes, plus the per-shard manifest (counts, byte sizes,
 * checksums) every release ships next to them.
 *
 * Scale discipline (the X67/X78 WARC/WET writer pattern):
 *  - ONE distributed pass: rows repartition BY THE SHARD KEY and sort
 *    within partitions, each task streams its complete (shard, pack) runs
 *    straight into `TarCodec.write` via Hadoop FS — no driver collection,
 *    no second shuffle.
 *  - Shard FILE NAMES derive from the data (`{shard}-{pack_id}.tar`),
 *    never from partition ids, and entries are `{doc_id}.txt` in doc_id
 *    order — reruns produce byte-identical artifacts, so the manifest
 *    digests are reproducible facts about the corpus, not the run.
 *  - At 100 TB the pack budget is the shard-size knob (~1 GiB tars in
 *    production; the test rows use the fixture's proven 2048-token packs).
 *    Each tar is one task's sequential write; readers stream members —
 *    exactly why the format has no index to build or maintain.
 */
object TrainingShards {

  /** Write `packed` — (shard: string, pack_id: long, doc_id: long,
    * text: string) — as one tar per (shard, pack_id) under `outDir`. */
  def writeTarShards(packed: DataFrame, outDir: String): Unit = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      packed.sparkSession.sparkContext.hadoopConfiguration)
    packed
      .select(col("shard").cast("string"), col("pack_id").cast("long"),
        col("doc_id").cast("long"), col("text").cast("string"))
      .repartition(col("shard"), col("pack_id"))
      .sortWithinPartitions("shard", "pack_id", "doc_id")
      .foreachPartition { (it: Iterator[Row]) =>
        // The sort guarantees each (shard, pack) is one consecutive run;
        // open a tar when the run key changes and STREAM members into it —
        // header, payload, padding per entry, EOF blocks on close. At the
        // ~1 GiB production shard size a buffer-then-write would hold the
        // whole shard (×copies) in task heap; streaming holds one member.
        var key: (String, Long) = null
        var out: org.apache.hadoop.fs.FSDataOutputStream = null
        def close(): Unit = if (out != null) {
          try out.write(new Array[Byte](2 * 512)) // tar EOF: two zero blocks
          finally { out.close(); out = null }
        }
        try {
          it.foreach { r =>
            val k = (r.getString(0), r.getLong(1))
            if (k != key) {
              close(); key = k
              val path = new org.apache.hadoop.fs.Path(
                s"$outDir/${k._1}-${k._2}.tar")
              out = path.getFileSystem(conf.value).create(path, true)
            }
            val data = r.getString(3).getBytes("UTF-8")
            out.write(TarCodec.header(s"${r.getLong(2)}.txt", data.length.toLong))
            out.write(data)
            val pad = (512 - (data.length % 512)) % 512
            if (pad > 0) out.write(new Array[Byte](pad))
          }
          close()
        } finally if (out != null) out.close()
      }
  }

  /** Stream every member of every shard back: one row per tar entry —
    * (shard_file basename, entry name, payload as UTF-8 text). The scan
    * parallelizes per file (binaryFile source); parse verifies every
    * header checksum, so silent corruption cannot round-trip. */
  def readTarShards(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(s"$dir/*.tar")
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val file = path.split('/').last
        TarCodec.parse(bytes).map { case (name, data) =>
          (file, name, new String(data, "UTF-8"))
        }
      }
      .toDF("shard_file", "entry", "text")
  }

  /** The manifest BY RE-READING the written artifacts (what a release
    * gate recomputes to certify shards): per tar — member count, payload
    * byte total, and digest = md5 over the concatenated per-member md5
    * hexes in member order. Entry order inside a shard is doc_id order by
    * construction, so the digest is SQL-replayable from the corpus. */
  def manifestFromShards(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(s"$dir/*.tar")
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (path, bytes) =>
        val members = TarCodec.parse(bytes)
        val md = java.security.MessageDigest.getInstance("MD5")
        def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
        val chain = members.map(m => hex(md.digest(m._2))).mkString
        (path.split('/').last, members.size.toLong,
          members.map(_._2.length.toLong).sum,
          hex(md.digest(chain.getBytes("US-ASCII"))))
      }
      .toDF("shard_file", "n_docs", "payload_bytes", "digest")
  }
}
