package graft

import graft.codec.TarCodec

/**
 * X100 tar framing: 512-byte header layout, block padding, the two-zero-
 * block EOF, checksum verification (corruption fails loudly), and the
 * end-to-end shard write → re-read → manifest path over Spark.
 */
class TarCodecSpec extends SparkSpec {

  private def entry(n: String, s: String): (String, Array[Byte]) =
    (n, s.getBytes("UTF-8"))

  test("framing: header blocks, padding to 512, two-zero-block EOF") {
    // payload sizes straddling the block boundary: 0, 1, 511, 512, 513
    val sizes = Seq(0, 1, 511, 512, 513)
    val entries = sizes.map(n => entry(s"$n.txt", "x" * n))
    val bytes = TarCodec.write(entries)
    val expected = sizes.map(n => 512 + ((n + 511) / 512) * 512).sum + 1024
    assert(bytes.length == expected,
      s"archive must be header+padded-data per member + 1024 EOF; got ${bytes.length}")
    // EOF is exactly two zero blocks
    assert(bytes.takeRight(1024).forall(_ == 0))
    // ustar magic at offset 257 of the first header
    assert(new String(bytes, 257, 5, "US-ASCII") == "ustar")
    assert(bytes(262) == 0 && new String(bytes, 263, 2, "US-ASCII") == "00")
    // typeflag regular file
    assert(bytes(156) == '0')
  }

  test("round-trip: names, payloads, order, including empty and block-exact members") {
    val entries = Seq(entry("1.txt", ""), entry("2.txt", "hello world"),
      entry("3.txt", "y" * 512), entry("4.txt", "z" * 1000),
      entry("a-very-reasonable-name.json", """{"k": 1}"""))
    val back = TarCodec.parse(TarCodec.write(entries))
    assert(back.map(_._1) == entries.map(_._1).toVector)
    back.zip(entries).foreach { case ((_, got), (n, want)) =>
      assert(java.util.Arrays.equals(got, want), n)
    }
  }

  test("writer output is deterministic: same entries, same bytes") {
    val entries = Seq(entry("7.txt", "abc"), entry("8.txt", "defg"))
    assert(java.util.Arrays.equals(TarCodec.write(entries), TarCodec.write(entries)))
  }

  test("corruption fails loudly: flipped payload-adjacent header byte, bad magic, truncation") {
    val bytes = TarCodec.write(Seq(entry("1.txt", "hello")))
    // flip a name byte → checksum mismatch
    val c1 = bytes.clone(); c1(1) = 'X'.toByte
    assert(intercept[IllegalArgumentException](TarCodec.parse(c1))
      .getMessage.contains("checksum"))
    // break the magic
    val c2 = bytes.clone(); c2(257) = 'q'.toByte
    assert(intercept[IllegalArgumentException](TarCodec.parse(c2))
      .getMessage.contains("magic"))
    // truncate mid-data
    val c3 = java.util.Arrays.copyOfRange(bytes, 0, 512 + 2)
    assert(intercept[IllegalArgumentException](TarCodec.parse(c3))
      .getMessage.contains("truncated"))
  }

  test("name-field contract: 100-byte classic limit enforced, empty rejected") {
    intercept[IllegalArgumentException](TarCodec.header("a" * 101, 0L))
    intercept[IllegalArgumentException](TarCodec.header("", 0L))
    assert(TarCodec.header("a" * 100, 0L).length == 512)
  }

  test("end-to-end: write shards over Spark, re-read equals the packed plane, manifest recomputes") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = (0L until 97L)
      .map(i => (i, if (i % 3 == 0) "s0" else "s1", s"doc $i body " + ("w " * (i % 13).toInt)))
      .toDF("doc_id", "shard", "text")
      .withColumn("pack_id", (col("doc_id") % 4).cast("long"))
    val wd = java.nio.file.Files.createTempDirectory("graft-tarspec").toString
    graft.sources.TrainingShards.writeTarShards(docs, wd)
    val back = graft.sources.TrainingShards.readTarShards(spark, wd)
    assert(back.count() == 97L)
    // every member maps back to its doc and its exact text
    val got = back.select(
      regexp_extract(col("entry"), "^([0-9]+)\\.txt$", 1).cast("long").as("doc_id"),
      col("shard_file"), col("text"))
      .as[(Long, String, String)].collect()
      .map { case (id, f, t) => id -> ((f, t)) }.toMap
    docs.select("doc_id", "shard", "pack_id", "text")
      .as[(Long, String, Long, String)].collect().foreach { case (id, sh, p, t) =>
        assert(got(id) == ((s"$sh-$p.tar", t)), s"doc $id")
      }
    // manifest counts and digests recompute from the logical content
    val mani = graft.sources.TrainingShards.manifestFromShards(spark, wd)
      .as[(String, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    val byShard = docs.as[(Long, String, String, Long)].collect()
      .groupBy { case (id, sh, _, p) => s"$sh-$p.tar" }
    assert(mani.keySet == byShard.keySet)
    byShard.foreach { case (f, rows) =>
      val ordered = rows.sortBy(_._1)
      val md = java.security.MessageDigest.getInstance("MD5")
      def hex(b: Array[Byte]) = b.map("%02x".format(_)).mkString
      val chain = ordered.map(r => hex(md.digest(r._3.getBytes("UTF-8")))).mkString
      assert(mani(f)._2 == rows.length.toLong, f)
      assert(mani(f)._3 == rows.map(_._3.getBytes("UTF-8").length.toLong).sum, f)
      assert(mani(f)._4 == hex(md.digest(chain.getBytes("US-ASCII"))), f)
    }
  }
}
