package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.codec.Codecs._
import graft.functions.HiveTypes
import graft.functions.HiveTypes._
import graft.model._
import graft.operators.Projection

/** P3/P4 writable-projection decision tables + §2.8 Hive type parsing. */
class ProjectionHiveTypesSpec extends SparkSpec {
  import spark.implicits._

  test("P3 toTableInput drops non-writables, keeps writables, table params win") {
    val sd = StorageDescriptor(
      columns = Seq(SdColumn("a", "int")),
      location = Some("s3://x"),
      parameters = Map("src" -> "sd"))
    val tables = spark.createDataset(Seq(
      GTable(name = "with_params", databaseName = "db", owner = Some("o"),
        createTimeMs = Some(1L), updateTimeMs = Some(2L), lastAccessTimeMs = Some(3L),
        retention = 9, storageDescriptor = Some(sd), tableType = Some("EXTERNAL_TABLE"),
        parameters = Map("src" -> "tbl"), createdBy = Some("arn:crawler")),
      GTable(name = "empty_params", databaseName = "db", storageDescriptor = Some(sd),
        parameters = Map.empty)))
    val out = Projection.toTableInput(tables.toDF()).as[GTable].collect()
      .map(t => t.name -> t).toMap

    val w = out("with_params")
    assert(w.createTimeMs.isEmpty && w.updateTimeMs.isEmpty && w.createdBy.isEmpty)
    assert(w.retention == 0)
    // writable set survives
    assert(w.owner.contains("o") && w.lastAccessTimeMs.contains(3L)
      && w.tableType.contains("EXTERNAL_TABLE") && w.storageDescriptor.contains(sd))
    // the java:186 overwrite: table-level parameters win...
    assert(w.parameters == Map("src" -> "tbl"))
    // ...even when empty — the SD copy is dead (java:181-182)
    assert(out("empty_params").parameters == Map.empty)
    assert(out("empty_params").storageDescriptor.get.parameters == Map("src" -> "sd"))
  }

  test("P4 toPartitionInput keeps identity + SD only") {
    val sd = StorageDescriptor(location = Some("s3://x/p=1"))
    val parts = spark.createDataset(Seq(
      GPartition(Seq("1"), "db", "t", creationTimeMs = Some(5L),
        lastAccessTimeMs = Some(6L), storageDescriptor = Some(sd),
        parameters = Map("k" -> "v"))))
    val out = Projection.toPartitionInput(parts.toDF()).as[GPartition].head()
    assert(out.values == Seq("1") && out.databaseName == "db" && out.tableName == "t")
    assert(out.storageDescriptor.contains(sd))
    assert(out.creationTimeMs.isEmpty && out.lastAccessTimeMs.isEmpty)
    assert(out.parameters == null || out.parameters.isEmpty)
  }

  test("apply path runs the projections end-to-end") {
    val src = spark.createDataset(Seq(GTable(name = "t", databaseName = "db",
      createTimeMs = Some(42L), createdBy = Some("x"))))
    val diff = graft.operators.Importer.diffTables(src, spark.emptyDataset[GTable])
    val applied = graft.operators.Applier.applyTables(spark.emptyDataset[GTable], diff).head()
    assert(applied.createTimeMs.isEmpty && applied.createdBy.isEmpty)
  }

  // ----------------------------------------------------------- hive types

  test("parses the reference fixture's deep nested types") {
    val actor = "struct<id:int,login:string,display_login:string,gravatar_id:string,url:string,avatar_url:string>"
    val Right(t) = parse(actor)
    assert(kind(t) == "struct" && depth(t) == 2 && leafCount(t) == 6)
    assert(toSparkType(t) == StructType(Seq(
      StructField("id", IntegerType), StructField("login", StringType),
      StructField("display_login", StringType), StructField("gravatar_id", StringType),
      StructField("url", StringType), StructField("avatar_url", StringType))))

    // the giant payload type from the fixture (4400+ chars) must parse too
    val payloadType = {
      val txt = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        "/root/reference/src/test/resources/sample_table_schema.json")), "UTF-8")
      import spark.implicits._
      spark.createDataset(Seq(txt)).toDF("payload")
        .select(from_json(col("payload"), graft.codec.ReferenceWire.tableSchema).as("t"))
        .select(explode(col("t.storageDescriptor.columns")).as("c"))
        .where(col("c.name") === "payload")
        .select(col("c.type")).as[String].head()
    }
    val parsed = parse(payloadType)
    assert(parsed.isRight, parsed.left.toOption)
    assert(depth(parsed.toOption.get) > 4)
  }

  test("primitive parameters, whitespace, malformed inputs") {
    assert(parse("decimal(10,2)").map(toSparkType) == Right(DecimalType(10, 2)))
    assert(parse("varchar(65535)").map(toSparkType) == Right(StringType))
    assert(parse("map< string , array<int> >").map(kind) == Right("map"))
    assert(parse("uniontype<int,string>").map(toSparkType) == Right(StringType))
    assert(parse("array<").isLeft)
    assert(parse("struct<a:int").isLeft)
    assert(parse("int extra").isLeft)
    assert(parse("").isLeft)
  }

  test("toSparkType round-trips through catalogString for standard shapes") {
    Seq("int", "array<string>", "map<string,array<int>>",
      "struct<a:int,b:struct<c:decimal(10,2)>>").foreach { s =>
      assert(parse(s).map(t => toSparkType(t).catalogString) == Right(s), s)
    }
  }

  test("registered UDFs are null-safe on malformed metadata") {
    HiveTypes.register(spark)
    val out = Seq("int", "not<a<type", null.asInstanceOf[String]).toDF("ht")
      .select(call_udf("hive_type_kind", col("ht")).as("k"),
        call_udf("hive_type_depth", col("ht")).as("d"))
      .collect()
    assert(out(0).getString(0) == "primitive" && out(0).getInt(1) == 1)
    assert(out(1).isNullAt(0) && out(1).isNullAt(1))
    assert(out(2).isNullAt(0) && out(2).isNullAt(1))
  }
}
