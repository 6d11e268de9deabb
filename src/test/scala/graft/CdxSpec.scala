package graft

import org.apache.spark.sql.functions._

import graft.codec.{CdxCodec, WarcCodec}
import graft.sources.WarcRangeReader

/**
 * X74 CDX(J) index + selective fetch: the index must describe the shard's
 * REAL byte extents (honest synthesis), the engine's split+from_json read
 * path must round-trip the writer, and the range reader must touch ONLY
 * the selected members — proven by corrupting an unselected member's
 * compressed bytes: any accidental inflate of it throws (the gz member
 * walk verifies CRC32 + ISIZE loudly), so a clean fetch IS the proof.
 */
class CdxSpec extends SparkSpec {
  import spark.implicits._

  private def entries = Seq(
    WarcCodec.GzEntry("http://WWW.Example.COM/doc/1", "<html><body>alpha beta gamma</body></html>"),
    WarcCodec.GzEntry("http://Blog.Example.CO.UK/doc/2", "<html><body>delta epsilon</body></html>",
      status = 404),
    WarcCodec.GzEntry("http://News.Site3.org/a/3", "<html><body>zeta eta theta iota</body></html>",
      mime = "application/pdf"),
    WarcCodec.GzEntry("http://example.com/entry/4", "<html><body>kappa lambda mu</body></html>"))

  test("surt reverses host labels and drops scheme/port/query/fragment; total on garbage") {
    assert(CdxCodec.surt("http://Blog.Example.CO.UK/doc/7") == "uk,co,example,blog)/doc/7")
    assert(CdxCodec.surt("HTTPS://WWW.Example.COM:443/a/b?x=1#f") == "com,example,www)/a/b")
    assert(CdxCodec.surt("http://example.com") == "com,example)/")
    assert(CdxCodec.surt("not a url") == "not a url")
    assert(CdxCodec.surt("") == "")
  }

  test("writeGzIndexed extents slice back to exactly their member") {
    val (bytes, extents) = WarcCodec.writeGzIndexed(entries)
    assert(extents.length == entries.length)
    extents.zip(entries).foreach { case ((uri, off, len), e) =>
      val slice = java.util.Arrays.copyOfRange(bytes, off.toInt, (off + len).toInt)
      val recs = WarcCodec.parseGz(slice)
      assert(recs.length == 1, s"extent of $uri holds ${recs.length} records")
      assert(recs.head.targetUri == e.uri)
      assert(recs.head.httpStatus == e.status)
      assert(recs.head.contentType == e.mime)
      assert(recs.head.body == e.html)
    }
    // extents tile the shard exactly after the warcinfo member
    val sorted = extents.sortBy(_._2)
    sorted.sliding(2).foreach {
      case Seq((_, o1, l1), (_, o2, _)) => assert(o1 + l1 == o2)
      case _ =>
    }
    assert(sorted.last._2 + sorted.last._3 == bytes.length)
  }

  test("formatLine round-trips through the engine's split + from_json read path") {
    val (_, extents) = WarcCodec.writeGzIndexed(entries)
    val lines = extents.zip(entries).map { case ((uri, off, len), e) =>
      CdxCodec.formatLine(CdxCodec.CdxEntry(uri, "20260101000000", e.status,
        e.mime, CdxCodec.md5Hex(e.html), "shard0.warc.gz", off, len))
    }
    val parsed = lines.toDF("line")
      .select(split(col("line"), " ", 3).as("f"))
      .select(col("f").getItem(0).as("surt_key"),
        from_json(col("f").getItem(2),
          org.apache.spark.sql.types.StructType.fromDDL(
            CdxCodec.PayloadSchemaDdl)).as("j"))
      .select(col("surt_key"), col("j.url"), col("j.status").cast("int").as("status"),
        col("j.mime"), col("j.offset").cast("long").as("offset"),
        col("j.length").cast("long").as("length"))
      .collect()
    parsed.zip(extents.zip(entries)).foreach { case (row, ((uri, off, len), e)) =>
      assert(row.getString(0) == CdxCodec.surt(uri))
      assert(row.getString(1) == e.uri)
      assert(row.getInt(2) == e.status)
      assert(row.getString(3) == e.mime)
      assert(row.getLong(4) == off && row.getLong(5) == len)
    }
  }

  test("selective fetch returns exactly the selected members' bodies") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cdxspec").toString
    val (bytes, extents) = WarcCodec.writeGzIndexed(entries)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "s0.warc.gz"), bytes)
    val sel = extents.filter { case (uri, _, _) => uri.contains("/doc/1") || uri.contains("/entry/4") }
      .map { case (_, o, l) => (s"$dir/s0.warc.gz", o, l) }
    val got = WarcRangeReader.fetchMembers(sel.toDF("filename", "offset", "length"))
      .as[(String, String)].collect().toMap
    assert(got.keySet == Set("http://WWW.Example.COM/doc/1", "http://example.com/entry/4"))
    assert(got("http://WWW.Example.COM/doc/1").contains("alpha beta gamma"))
  }

  test("unselected members are NEVER inflated: corrupting one leaves selective fetch intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cdxspec2").toString
    val (bytes, extents) = WarcCodec.writeGzIndexed(entries)
    // corrupt the MIDDLE of member #2's compressed payload (inside the
    // deflate stream, past the 10-byte gzip header)
    val (_, off2, len2) = extents(1)
    val corrupted = bytes.clone()
    val mid = (off2 + len2 / 2).toInt
    corrupted(mid) = (corrupted(mid) ^ 0x5a).toByte
    val p = java.nio.file.Paths.get(dir, "s0.warc.gz")
    java.nio.file.Files.write(p, corrupted)
    // a full-file parse DOES trip on the corruption (the member walk is loud)
    intercept[Exception] { WarcCodec.parseGz(corrupted) }
    // ...but fetching the OTHER members' ranges never touches those bytes
    val sel = Seq(extents(0), extents(2), extents(3))
      .map { case (_, o, l) => (s"$dir/s0.warc.gz", o, l) }
    val got = WarcRangeReader.fetchMembers(sel.toDF("filename", "offset", "length"))
      .as[(String, String)].collect()
    assert(got.length == 3)
    assert(!got.exists(_._1.contains("/doc/2")))
    // and fetching the corrupted member's own range throws loudly
    val bad = Seq((s"$dir/s0.warc.gz", off2, len2)).toDF("filename", "offset", "length")
    intercept[org.apache.spark.SparkException] {
      WarcRangeReader.fetchMembers(bad).collect()
    }
  }

  test("columnar index: status/mime/domain predicates push to the parquet scan, columns prune") {
    // the default metadata string length elides the PushedFilters list
    val prev = spark.conf.get("spark.sql.maxMetadataStringLength", "100")
    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
    try {
    val df = SparkEntry.queries("d_cdx_parquet_select")(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // the index scan section: the one parquet FileScan over the index
    val scan = plan.split("FileScan").find(_.contains("PushedFilters"))
      .getOrElse(fail(s"no parquet index scan in plan:\n$plan"))
    // all three selection predicates land in PushedFilters — at 100 TB this
    // is row-group pruning on the index instead of a full JSON-lines parse
    Seq("EqualTo(status,200)", "EqualTo(mime,text/html)",
      "EqualTo(url_registered_domain,example.co.uk)").foreach { f =>
      assert(scan.contains(f), s"missing pushed filter $f in:\n$scan")
    }
    // column pruning: the wide index narrows to the consumed columns —
    // surt_key/ts/url_host never reach the scan schema
    val readSchema = scan.split("ReadSchema:").lift(1)
      .getOrElse(fail(s"no ReadSchema in:\n$scan"))
    Seq("surt_key", "ts:", "url_host:").foreach { c =>
      assert(!readSchema.contains(c), s"unpruned column $c in:\n$readSchema")
    }
    // and the columnar path agrees with the line-index path row for row
    val a = df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val b = SparkEntry.queries("d_cdx_select")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(a == b, "columnar and line-index selections diverge")
    } finally spark.conf.set("spark.sql.maxMetadataStringLength", prev)
  }
}
