package graft.codec

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.model._

/**
 * JSON wire-format codecs for the catalog entity planes.
 *
 * The reference serializes every payload with Gson (SNSUtil.java:101-102,
 * ExportDatabaseWithTables.java:180-181) and parses consumed messages with
 * `gson.fromJson`, catching syntax errors (ImportDatabaseOrTable.java:117-132).
 * Here the same round-trip is `to_json(struct(...))` / `from_json(col, schema)`;
 * corrupt payloads surface as a null struct instead of an exception, which the
 * import plan routes to dead_letters (§2.2 P6 mapping in SURVEY.md).
 */
object Codecs {

  implicit val dbEncoder: Encoder[GDatabase] = Encoders.product[GDatabase]
  implicit val tableEncoder: Encoder[GTable] = Encoders.product[GTable]
  implicit val partitionEncoder: Encoder[GPartition] = Encoders.product[GPartition]
  implicit val messageEncoder: Encoder[CatalogMessage] = Encoders.product[CatalogMessage]
  implicit val auditEncoder: Encoder[AuditRecord] = Encoders.product[AuditRecord]
  implicit val actionEncoder: Encoder[ReplicationAction] = Encoders.product[ReplicationAction]
  implicit val deadLetterEncoder: Encoder[DeadLetter] = Encoders.product[DeadLetter]

  val databaseSchema: StructType = dbEncoder.schema
  val tableSchema: StructType = tableEncoder.schema
  val partitionSchema: StructType = partitionEncoder.schema
  val sdColumnType: StructType = Encoders.product[SdColumn].schema

  /** `{table, partitionList}` envelope — the reference's wire format for small
    * tables (util/TableWithPartitions.java:10-26). */
  val tableWithPartitionsSchema: StructType = new StructType()
    .add("table", tableSchema)
    .add("partitionList", org.apache.spark.sql.types.ArrayType(partitionSchema))

  /** Large-table stub (util/LargeTable.java:14-70): partitions ride in a JSON-lines
    * side-channel file instead of the message body. */
  val largeTableSchema: StructType = new StructType()
    .add("catalogId", org.apache.spark.sql.types.StringType)
    .add("largeTable", org.apache.spark.sql.types.BooleanType)
    .add("numberOfPartitions", org.apache.spark.sql.types.LongType)
    .add("table", tableSchema)
    .add("s3ObjectKey", org.apache.spark.sql.types.StringType)
    .add("s3BucketName", org.apache.spark.sql.types.StringType)

  /** Serialize all columns of `df` into a single JSON `payload` column. */
  def toPayload(df: DataFrame): Column = to_json(struct(df.columns.map(col).toSeq: _*))

  /** Parse a JSON payload column with the given schema; malformed JSON yields a
    * null struct (PERMISSIVE), which callers filter into dead_letters. */
  def parsePayload(payload: Column, schema: StructType): Column =
    from_json(payload, schema, Map("mode" -> "PERMISSIVE"))

  /** Line-delimited JSON partition files — the large-table S3 side-channel
    * (S3Util.java:201-236 reads one Partition per line). */
  def readPartitionLines(spark: SparkSession, path: String): Dataset[GPartition] =
    spark.read.schema(partitionSchema).json(path).as[GPartition]

  def writePartitionLines(parts: Dataset[GPartition], path: String): Unit =
    parts.write.mode("overwrite").json(path)
}
