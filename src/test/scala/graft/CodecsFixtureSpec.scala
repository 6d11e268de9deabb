package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.codec.{Codecs, ReferenceWire}

/**
 * Golden-fixture round-trips (SURVEY §5.2.1): the reference's own sample
 * payloads (src/test/resources/sample_*.json — Gson output with locale date
 * strings and `<`-escaped Hive types) must parse losslessly into the typed
 * planes and survive the internal wire round-trip.
 */
class CodecsFixtureSpec extends SparkSpec {

  private val fixtureDir = "/root/reference/src/test/resources"

  private def fixture(name: String): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$fixtureDir/$name")), "UTF-8")

  /** sample_partitions_schema.json is CONCATENATED pretty-printed JSON objects
    * (Gson stream output, not an array) — split on brace depth. */
  private def splitConcatenatedObjects(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var start = -1
    var inString = false
    var escaped = false
    s.zipWithIndex.foreach { case (c, i) =>
      if (escaped) escaped = false
      else if (inString) {
        if (c == '\\') escaped = true
        else if (c == '"') inString = false
      } else c match {
        case '"' => inString = true
        case '{' => if (depth == 0) start = i; depth += 1
        case '}' => depth -= 1; if (depth == 0) { out += s.substring(start, i + 1) }
        case _ =>
      }
    }
    out.result()
  }

  private def df(json: String*) = {
    import spark.implicits._
    spark.createDataset(json).toDF("payload")
  }

  test("reference table fixture parses: dates, hive '<' types, nested SD survive") {
    val row = df(fixture("sample_table_schema.json"))
      .select(ReferenceWire.tableIn(col("payload")).as("t"))
      .select("t.*").head()

    assert(row.getAs[String]("name") == "data")
    assert(row.getAs[String]("databaseName") == "database_in_account_a")
    // Gson date "Sep 25, 2019 1:31:08 PM" (session TZ = UTC) → epoch ms
    assert(row.getAs[Long]("createTimeMs") == 1569418268000L) // 2019-09-25T13:31:08Z
    assert(row.getAs[String]("createdBy").startsWith("arn:aws:sts::"))
    val sd = row.getAs[Row]("storageDescriptor")
    val cols = sd.getAs[scala.collection.Seq[Row]]("columns")
    val actor = cols.find(_.getAs[String]("name") == "actor").get
    // the `<` characters Gson escapes as < must round out of JSON intact
    assert(actor.getAs[String]("colType") == CodecsFixtureSpec.ActorHiveType)
    assert(sd.getAs[Boolean]("compressed"))
    assert(sd.getAs[Row]("serdeInfo").getAs[String]("serializationLibrary")
      == "org.openx.data.jsonserde.JsonSerDe")
    assert(row.getAs[scala.collection.Seq[Row]]("partitionKeys").map(_.getAs[String]("name"))
      == Seq("partition_0", "partition_1", "partition_2"))
    assert(row.getAs[Map[String, String]]("parameters")("recordCount") == "4795154")
  }

  test("reference table fixture: internal wire round-trip is lossless") {
    val internal = df(fixture("sample_table_schema.json"))
      .select(ReferenceWire.tableIn(col("payload")).as("t"))
    val roundTripped = internal
      .select(to_json(col("t")).as("payload"))
      .select(from_json(col("payload"), Codecs.tableSchema).as("t"))
    assert(internal.head() == roundTripped.head())
  }

  test("reference table fixture: reference-format egress re-parses to the same table") {
    val internal = df(fixture("sample_table_schema.json"))
      .select(ReferenceWire.tableIn(col("payload")).as("t"))
    val reEgressed = internal
      .select(ReferenceWire.tableOut(col("t")).as("payload"))
      .select(ReferenceWire.tableIn(col("payload")).as("t"))
    assert(internal.head() == reEgressed.head())
  }

  test("table description survives ingest, internal round-trip, egress, and the TableInput projection") {
    // The reference's TableInput copies description (GlueUtil.java:177); its
    // own fixture carries none, so pin the wire fidelity with a
    // description-bearing payload end-to-end.
    val payload = """{"name":"t1","databaseName":"db1","description":"minute-grain events",
      "owner":"me","retention":3,"parameters":{"k":"v"}}"""
    val internal = df(payload).select(ReferenceWire.tableIn(col("payload")).as("t"))
    assert(internal.select(col("t.description")).head().getString(0) == "minute-grain events")

    // internal JSON wire round-trip keeps it
    val roundTripped = internal.select(to_json(col("t")).as("payload"))
      .select(from_json(col("payload"), Codecs.tableSchema).as("t"))
    assert(roundTripped.head() == internal.head())

    // reference-format egress keeps it
    val egressed = internal.select(ReferenceWire.tableOut(col("t")).as("payload")).head().getString(0)
    assert(egressed.contains(""""description":"minute-grain events""""))

    // P3 TableInput projection keeps description, drops the catalog-managed set
    val projected = graft.operators.Projection.toTableInput(internal.select(col("t.*"))).head()
    assert(projected.getAs[String]("description") == "minute-grain events")
    assert(projected.isNullAt(projected.fieldIndex("createdBy")))
  }

  test("reference partitions fixture: every concatenated object parses with identity intact") {
    val objs = splitConcatenatedObjects(fixture("sample_partitions_schema.json"))
    assert(objs.nonEmpty)
    val rows = df(objs: _*)
      .select(ReferenceWire.partitionIn(col("payload")).as("p"))
      .select("p.*")
      .collect()
    assert(rows.length == objs.length)
    rows.foreach { r =>
      assert(r.getAs[String]("databaseName") == "database_in_account_a")
      assert(r.getAs[String]("tableName") == "data")
      assert(r.getAs[scala.collection.Seq[String]]("values").length == 3)
      assert(r.getAs[Long]("creationTimeMs") > 0L)
    }
  }

  test("reference large-table message fixture: stub parses with S3 coords and nested table") {
    val row = df(fixture("sample_large-table_message_payload.json"))
      .select(ReferenceWire.largeTableIn(col("payload")).as("m"))
      .select("m.*").head()
    assert(row.getAs[Boolean]("largeTable"))
    assert(row.getAs[Long]("numberOfPartitions") == 31L)
    assert(row.getAs[String]("s3BucketName") == "bucket_name")
    assert(row.getAs[String]("s3ObjectKey").contains("database_in_account_a"))
    assert(row.getAs[Row]("table").getAs[String]("name") == "data")
  }

  test("reference database fixture parses; malformed payload yields null name (dead-letter route)") {
    val ok = df(fixture("sample_database_schema.json"))
      .select(ReferenceWire.databaseIn(col("payload")).as("d")).select("d.*").head()
    assert(ok.getAs[String]("name") == "database_in_account_a")
    assert(ok.getAs[Long]("createTimeMs") == 1568153815000L)

    val bad = df("""{"name": oops-not-json""")
      .select(Codecs.parsePayload(col("payload"), Codecs.databaseSchema).as("d"))
      .head()
    assert(bad.isNullAt(0) || bad.getAs[Row]("d").isNullAt(0))
  }
}

object CodecsFixtureSpec {
  /** The fixture's `actor` column Hive type, pinned verbatim so an
    * unescaping regression is caught byte-for-byte. */
  val ActorHiveType =
    "struct<id:int,login:string,display_login:string,gravatar_id:string,url:string,avatar_url:string>"
}
