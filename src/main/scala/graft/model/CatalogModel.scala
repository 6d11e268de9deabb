package graft.model

/**
 * Typed data model for the catalog-replication core.
 *
 * Mirrors the entity kinds the reference manipulates as row-oriented POJOs
 * (reference: util/GlueUtil.java:20,35,40 — Database/Table/Partition;
 * util/TableWithPartitions.java:10-26; util/LargeTable.java:14-70;
 * util/TableReplicationStatus.java:13-27; DDBUtil.java:54-65,150-157),
 * re-expressed as Spark case classes so each entity plane is a
 * `Dataset[T]` with nested columns instead of JSON-POJO round-trips.
 *
 * Hive type strings inside `SdColumn.colType` stay opaque payload, exactly
 * as the reference treats them (it never parses them) — see
 * graft.functions.HiveTypes for the optional introspection path.
 */

/** A column inside a StorageDescriptor or partition-key list: name + opaque
  * Hive type string (may be deeply nested `struct<...>`/`array<struct<...>>`). */
final case class SdColumn(name: String, colType: String, comment: Option[String] = None)

final case class SerdeInfo(
    serializationLibrary: Option[String] = None,
    parameters: Map[String, String] = Map.empty)

/** Physical-layout descriptor nested in tables and partitions
  * (reference sample: src/test/resources/sample_table_schema.json:9-72). */
final case class StorageDescriptor(
    columns: Seq[SdColumn] = Seq.empty,
    location: Option[String] = None,
    inputFormat: Option[String] = None,
    outputFormat: Option[String] = None,
    compressed: Boolean = false,
    numberOfBuckets: Int = -1,
    serdeInfo: Option[SerdeInfo] = None,
    bucketColumns: Seq[String] = Seq.empty,
    sortColumns: Seq[SdColumn] = Seq.empty,
    parameters: Map[String, String] = Map.empty,
    storedAsSubDirectories: Boolean = false)

/** Catalog database (reference: GlueUtil.java:146-149). `name` is the join key. */
final case class GDatabase(
    name: String,
    description: Option[String] = None,
    locationUri: Option[String] = None,
    parameters: Map[String, String] = Map.empty,
    createTimeMs: Option[Long] = None)

/** Catalog table (reference field set copied at GlueUtil.java:175-192).
  * Key = (databaseName, name). */
final case class GTable(
    name: String,
    databaseName: String,
    description: Option[String] = None,
    owner: Option[String] = None,
    createTimeMs: Option[Long] = None,
    updateTimeMs: Option[Long] = None,
    lastAccessTimeMs: Option[Long] = None,
    retention: Int = 0,
    storageDescriptor: Option[StorageDescriptor] = None,
    partitionKeys: Seq[SdColumn] = Seq.empty,
    tableType: Option[String] = None,
    viewOriginalText: Option[String] = None,
    viewExpandedText: Option[String] = None,
    parameters: Map[String, String] = Map.empty,
    createdBy: Option[String] = None)

/** Catalog partition. Identity is the ordered `values` list — deletion keys on
  * exactly this (reference: GlueUtil.java:504-508). */
final case class GPartition(
    values: Seq[String],
    databaseName: String,
    tableName: String,
    creationTimeMs: Option[Long] = None,
    lastAccessTimeMs: Option[Long] = None,
    storageDescriptor: Option[StorageDescriptor] = None,
    parameters: Map[String, String] = Map.empty)

/** Unified transport envelope replacing the reference's three SNS/SQS wire
  * formats (database JSON / TableWithPartitions / LargeTable stub) plus their
  * message attributes (SNSUtil.java:95-97, SQSUtil.java:27-32). One dataset,
  * discriminated by `messageType` ∈ {database, table, largeTable}. */
final case class CatalogMessage(
    messageType: String,
    sourceCatalogId: String,
    exportBatchId: String,
    payload: String,               // entity JSON (db / table-with-partitions / large-table stub)
    s3BucketName: Option[String] = None, // large-table side-channel coords
    s3ObjectKey: Option[String] = None)

object MessageType {
  val Database = "database"
  val Table = "table"
  val LargeTable = "largeTable"
}

/** Per-entity replication outcome — the reference's TableReplicationStatus /
  * DBReplicationStatus booleans flattened onto the action-result plane. */
final case class ReplicationAction(
    entityKind: String,            // "database" | "table" | "partition"
    databaseName: String,
    tableName: Option[String],
    partitionValues: Option[Seq[String]],
    action: String)                // "create" | "update" | "skip" | "delete"

object Action {
  val Create = "create"
  val Update = "update"
  val Skip = "skip"
  val Delete = "delete"
}

/** Append-only audit row — DynamoDB item analogue (reference DDBUtil.java:54-65
  * table-import, 150-157 table-export; key table_id = name|db, sort key =
  * export_run_id epoch ms). Audit queries use "latest per id" windows instead
  * of DDB key+sort-key lookups. */
final case class AuditRecord(
    entityId: String,              // table_id "name|db" or db_id "db"
    entityKind: String,
    runId: Long,                   // export_run_id / import_run_id (epoch ms, injected for determinism)
    exportBatchId: String,
    catalogId: String,
    action: String,
    isLargeTable: Boolean = false,
    schemaJson: Option[String] = None,
    s3BucketName: Option[String] = None,
    s3ObjectKey: Option[String] = None,
    error: Option[String] = None)

/** A message that failed to parse or apply — the reference's DLQ queue as a
  * dataset (GDCUtil.java:112-116; SQSUtil.java:109-134). Carries the complete
  * original message (including large-table side-channel coords) so
  * ReDriveJob can reconstruct a CatalogMessage and re-run the import through
  * the same code path (DLQImportDatabaseOrTable.java:126-166). */
final case class DeadLetter(
    messageType: String,
    payload: String,
    exportBatchId: String,
    sourceCatalogId: String,
    error: String,
    s3BucketName: Option[String] = None,
    s3ObjectKey: Option[String] = None)
