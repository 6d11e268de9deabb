package graft.codec

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Adapters between the reference's Gson wire format and the typed entity
 * planes — the ingest/egress shim a migration from the reference deployment
 * would use to consume its live SNS/SQS payloads and S3 side-channel files.
 *
 * The reference serializes POJOs with stock Gson (SNSUtil.java:101-102), so
 * its wire format differs from the internal codec in two ways this module
 * owns end-to-end:
 *
 *  - **Dates are locale strings**, e.g. `"Sep 25, 2019 1:31:08 PM"` (Gson's
 *    default `Date` rendering; see every fixture under
 *    src/test/resources/sample_*.json). Internally times are epoch millis
 *    (`*TimeMs`); conversion is `try_to_timestamp` / `date_format` with
 *    [[GsonDatePattern]] — unparseable dates become null, they never throw.
 *  - **Column type fields are named `type`** (`sample_table_schema.json:12`),
 *    a Scala keyword, held internally as `SdColumn.colType`.
 *
 * Hive type strings (`struct<...>`, escaped by Gson as `<`) are opaque
 * payload in both formats; JSON unescaping is standard and lossless, so the
 * `<`/`>` fidelity the wire needs is exercised by the golden-fixture specs.
 */
object ReferenceWire {

  /** Gson's default java.util.Date text form (US locale, local time). */
  val GsonDatePattern = "MMM d, yyyy h:mm:ss a"

  // ------------------------------------------------------------ ref schemas

  private val refColumn = new StructType()
    .add("name", StringType).add("type", StringType).add("comment", StringType)

  private val refSerde = new StructType()
    .add("serializationLibrary", StringType)
    .add("parameters", MapType(StringType, StringType))

  private val refSd = new StructType()
    .add("columns", ArrayType(refColumn))
    .add("location", StringType)
    .add("inputFormat", StringType)
    .add("outputFormat", StringType)
    .add("compressed", BooleanType)
    .add("numberOfBuckets", IntegerType)
    .add("serdeInfo", refSerde)
    .add("bucketColumns", ArrayType(StringType))
    .add("sortColumns", ArrayType(refColumn))
    .add("parameters", MapType(StringType, StringType))
    .add("storedAsSubDirectories", BooleanType)

  /** Database JSON (sample_database_schema.json). */
  val databaseSchema: StructType = new StructType()
    .add("name", StringType)
    .add("description", StringType)
    .add("locationUri", StringType)
    .add("parameters", MapType(StringType, StringType))
    .add("createTime", StringType)

  /** Table JSON (sample_table_schema.json). */
  val tableSchema: StructType = new StructType()
    .add("name", StringType)
    .add("databaseName", StringType)
    .add("description", StringType)
    .add("owner", StringType)
    .add("createTime", StringType)
    .add("updateTime", StringType)
    .add("lastAccessTime", StringType)
    .add("retention", IntegerType)
    .add("storageDescriptor", refSd)
    .add("partitionKeys", ArrayType(refColumn))
    .add("tableType", StringType)
    .add("viewOriginalText", StringType)
    .add("viewExpandedText", StringType)
    .add("parameters", MapType(StringType, StringType))
    .add("createdBy", StringType)

  /** Partition JSON (sample_partitions_schema.json objects). */
  val partitionSchema: StructType = new StructType()
    .add("values", ArrayType(StringType))
    .add("databaseName", StringType)
    .add("tableName", StringType)
    .add("creationTime", StringType)
    .add("lastAccessTime", StringType)
    .add("storageDescriptor", refSd)
    .add("parameters", MapType(StringType, StringType))

  /** Large-table stub (sample_large-table_message_payload.json). */
  val largeTableSchema: StructType = new StructType()
    .add("catalogId", StringType)
    .add("largeTable", BooleanType)
    .add("numberOfPartitions", LongType)
    .add("table", tableSchema)
    .add("s3ObjectKey", StringType)
    .add("s3BucketName", StringType)

  // ----------------------------------------------------------- conversions

  private def msOf(c: Column): Column = unix_millis(try_to_timestamp(c, lit(GsonDatePattern)))
  private def strOf(ms: Column): Column =
    date_format(timestamp_millis(ms), GsonDatePattern)

  private def colsIn(c: Column): Column = transform(c, f =>
    struct(f("name").as("name"), f("type").as("colType"), f("comment").as("comment")))
  private def colsOut(c: Column): Column = transform(c, f =>
    struct(f("name").as("name"), f("colType").as("type"), f("comment").as("comment")))

  private def sdIn(c: Column): Column = when(c.isNotNull, struct(
    coalesce(colsIn(c("columns")), array().cast(ArrayType(Codecs.sdColumnType))).as("columns"),
    c("location").as("location"),
    c("inputFormat").as("inputFormat"),
    c("outputFormat").as("outputFormat"),
    coalesce(c("compressed"), lit(false)).as("compressed"),
    coalesce(c("numberOfBuckets"), lit(-1)).as("numberOfBuckets"),
    c("serdeInfo").as("serdeInfo"),
    coalesce(c("bucketColumns"), array().cast("array<string>")).as("bucketColumns"),
    coalesce(colsIn(c("sortColumns")), array().cast(ArrayType(Codecs.sdColumnType))).as("sortColumns"),
    c("parameters").as("parameters"),
    coalesce(c("storedAsSubDirectories"), lit(false)).as("storedAsSubDirectories")))

  private def sdOut(c: Column): Column = when(c.isNotNull, struct(
    colsOut(c("columns")).as("columns"),
    c("location").as("location"),
    c("inputFormat").as("inputFormat"),
    c("outputFormat").as("outputFormat"),
    c("compressed").as("compressed"),
    c("numberOfBuckets").as("numberOfBuckets"),
    c("serdeInfo").as("serdeInfo"),
    c("bucketColumns").as("bucketColumns"),
    colsOut(c("sortColumns")).as("sortColumns"),
    c("parameters").as("parameters"),
    c("storedAsSubDirectories").as("storedAsSubDirectories")))

  /** Parse a reference database JSON payload into the internal GDatabase struct. */
  def databaseIn(json: Column): Column = {
    val p = from_json(json, databaseSchema)
    struct(
      p("name").as("name"), p("description").as("description"),
      p("locationUri").as("locationUri"), p("parameters").as("parameters"),
      msOf(p("createTime")).as("createTimeMs"))
  }

  /** Parse a reference table JSON payload into the internal GTable struct. */
  def tableIn(json: Column): Column = tableStructIn(from_json(json, tableSchema))

  private[codec] def tableStructIn(p: Column): Column = struct(
    p("name").as("name"),
    p("databaseName").as("databaseName"),
    p("description").as("description"),
    p("owner").as("owner"),
    msOf(p("createTime")).as("createTimeMs"),
    msOf(p("updateTime")).as("updateTimeMs"),
    msOf(p("lastAccessTime")).as("lastAccessTimeMs"),
    coalesce(p("retention"), lit(0)).as("retention"),
    sdIn(p("storageDescriptor")).as("storageDescriptor"),
    coalesce(colsIn(p("partitionKeys")), array().cast(ArrayType(Codecs.sdColumnType))).as("partitionKeys"),
    p("tableType").as("tableType"),
    p("viewOriginalText").as("viewOriginalText"),
    p("viewExpandedText").as("viewExpandedText"),
    p("parameters").as("parameters"),
    p("createdBy").as("createdBy"))

  /** Internal GTable struct → reference-format JSON (Gson field names/dates). */
  def tableOut(t: Column): Column = to_json(struct(
    t("name").as("name"),
    t("databaseName").as("databaseName"),
    t("description").as("description"),
    t("owner").as("owner"),
    strOf(t("createTimeMs")).as("createTime"),
    strOf(t("updateTimeMs")).as("updateTime"),
    strOf(t("lastAccessTimeMs")).as("lastAccessTime"),
    t("retention").as("retention"),
    sdOut(t("storageDescriptor")).as("storageDescriptor"),
    colsOut(t("partitionKeys")).as("partitionKeys"),
    t("tableType").as("tableType"),
    t("viewOriginalText").as("viewOriginalText"),
    t("viewExpandedText").as("viewExpandedText"),
    t("parameters").as("parameters"),
    t("createdBy").as("createdBy")))

  /** Internal GDatabase struct → reference-format JSON (the planner's SNS
    * database message body, SNSUtil.java:101-109) — lets a reference
    * deployment's ImportDatabaseOrTable consume OUR exports. */
  def databaseOut(d: Column): Column = to_json(struct(
    d("name").as("name"),
    d("description").as("description"),
    d("locationUri").as("locationUri"),
    d("parameters").as("parameters"),
    strOf(d("createTimeMs")).as("createTime")))

  /** Internal GPartition struct → reference-format JSON object (one line of
    * the S3 side-channel file, S3Util.java:201-236 reads one per line). */
  def partitionOut(p: Column): Column = to_json(struct(
    p("values").as("values"),
    p("databaseName").as("databaseName"),
    p("tableName").as("tableName"),
    strOf(p("creationTimeMs")).as("creationTime"),
    strOf(p("lastAccessTimeMs")).as("lastAccessTime"),
    sdOut(p("storageDescriptor")).as("storageDescriptor"),
    p("parameters").as("parameters")))

  /** Internal large-table stub → reference-format JSON
    * (util/LargeTable.java:14-70 wire shape). Pass the nested table as a
    * GTable struct column. */
  def largeTableOut(
      catalogId: Column, numberOfPartitions: Column, table: Column,
      s3ObjectKey: Column, s3BucketName: Column): Column = to_json(struct(
    catalogId.as("catalogId"),
    org.apache.spark.sql.functions.lit(true).as("largeTable"),
    numberOfPartitions.as("numberOfPartitions"),
    tableStructOut(table).as("table"),
    s3ObjectKey.as("s3ObjectKey"),
    s3BucketName.as("s3BucketName")))

  /** The struct half of [[tableOut]] — reusable inside envelope formats. */
  private[codec] def tableStructOut(t: Column): Column = struct(
    t("name").as("name"),
    t("databaseName").as("databaseName"),
    t("description").as("description"),
    t("owner").as("owner"),
    strOf(t("createTimeMs")).as("createTime"),
    strOf(t("updateTimeMs")).as("updateTime"),
    strOf(t("lastAccessTimeMs")).as("lastAccessTime"),
    t("retention").as("retention"),
    sdOut(t("storageDescriptor")).as("storageDescriptor"),
    colsOut(t("partitionKeys")).as("partitionKeys"),
    t("tableType").as("tableType"),
    t("viewOriginalText").as("viewOriginalText"),
    t("viewExpandedText").as("viewExpandedText"),
    t("parameters").as("parameters"),
    t("createdBy").as("createdBy"))

  /** Parse a reference partition JSON object into the internal GPartition struct. */
  def partitionIn(json: Column): Column = {
    val p = from_json(json, partitionSchema)
    struct(
      p("values").as("values"),
      p("databaseName").as("databaseName"),
      p("tableName").as("tableName"),
      msOf(p("creationTime")).as("creationTimeMs"),
      msOf(p("lastAccessTime")).as("lastAccessTimeMs"),
      sdIn(p("storageDescriptor")).as("storageDescriptor"),
      p("parameters").as("parameters"))
  }

  /** Parse a reference large-table stub payload into the internal shape:
    * (numberOfPartitions, table struct, s3 coords). */
  def largeTableIn(json: Column): Column = {
    val p = from_json(json, largeTableSchema)
    struct(
      p("catalogId").as("catalogId"),
      coalesce(p("largeTable"), lit(false)).as("largeTable"),
      p("numberOfPartitions").as("numberOfPartitions"),
      tableStructIn(p("table")).as("table"),
      p("s3ObjectKey").as("s3ObjectKey"),
      p("s3BucketName").as("s3BucketName"))
  }
}
