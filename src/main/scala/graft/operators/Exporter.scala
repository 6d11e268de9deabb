package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.codec.Codecs
import graft.model._
import graft.sources.CatalogSnapshot

/**
 * Export plane: one Spark job replacing the reference's planner→SNS→
 * ExportDatabaseWithTables→SQS→ExportLargeTable Lambda chain
 * (ExportDatabaseWithTables.java:62-230, ExportLargeTable.java:37-178).
 *
 * Semantics preserved:
 *  - J4 existence-gated export: only databases present in the source snapshot
 *    are exported (the reference re-verifies each planner message against the
 *    source via getDatabaseIfExist, java:155-171 — here a left_semi join).
 *  - A1 per-table partition count drives routing and `numberOfPartitions`.
 *  - S-route size threshold (default 10, ExportDatabaseWithTables.java:73):
 *    small tables inline their partition list in the message
 *    (TableWithPartitions); large tables emit a stub + a JSON-lines
 *    side-channel file per table (the S3 object, ExportLargeTable.java:96-116).
 *    The 256 KB SNS cap that motivated the threshold doesn't exist here, so
 *    the threshold survives as a physical-layout flag: inlining bounds message
 *    width, the side-channel keeps the million-partition tables off the
 *    message plane entirely.
 *
 * Scale notes: the only shuffle is partitions grouped per (db, table) —
 * exactly the shuffle the semantics require. The small-table collect_list is
 * bounded by the threshold; large tables never materialize a per-table list,
 * they stream through a partitionBy file write.
 */
object Exporter {

  val DefaultLargeTableThreshold = 10

  /** A1: per-table partition counts. */
  def partitionCounts(parts: Dataset[GPartition]): DataFrame =
    parts.groupBy("databaseName", "tableName")
      .agg(count(lit(1)).as("numberOfPartitions"))

  /** Database messages for the selected databases (planner output,
    * SNSUtil.publishDatabaseSchemasToSNS:89-128). */
  def databaseMessages(
      selected: Dataset[GDatabase],
      catalogId: String,
      batchId: String): Dataset[CatalogMessage] = {
    import Codecs.messageEncoder
    selected
      .select(
        lit(MessageType.Database).as("messageType"),
        lit(catalogId).as("sourceCatalogId"),
        lit(batchId).as("exportBatchId"),
        to_json(struct(selected.columns.map(col).toSeq: _*)).as("payload"),
        lit(null).cast("string").as("s3BucketName"),
        lit(null).cast("string").as("s3ObjectKey"))
      .as[CatalogMessage]
  }

  /** Full export: (messages, largeTablePartitionFiles written under sideChannelDir). */
  def exportMessages(
      spark: SparkSession,
      snap: CatalogSnapshot,
      selected: Dataset[GDatabase],
      batchId: String,
      runId: Long,
      sideChannelDir: Option[String] = None,
      threshold: Int = DefaultLargeTableThreshold): Dataset[CatalogMessage] = {
    import Codecs._

    val dbMsgs = databaseMessages(selected, snap.catalogId, batchId)

    // J4 gate (broadcast semi-join — database plane is small).
    val gatedTables = snap.tables.join(
      broadcast(selected.select(col("name").as("databaseName"))),
      Seq("databaseName"), "left_semi")

    val counts = partitionCounts(snap.partitions)
    val tableStruct = struct(gatedTables.columns.map(gatedTables(_)).toSeq: _*).as("table")

    // Left join: tables with zero partitions still export (count = 0).
    val withCounts = gatedTables
      .join(counts,
        gatedTables("databaseName") === counts("databaseName") &&
          gatedTables("name") === counts("tableName"),
        "left_outer")
      .select(tableStruct,
        gatedTables("databaseName").as("dbName"),
        gatedTables("name").as("tblName"),
        coalesce(counts("numberOfPartitions"), lit(0L)).as("numberOfPartitions"))
      .withColumn("isLarge", col("numberOfPartitions") > lit(threshold.toLong))

    // Small branch: inline partition list, bounded by the threshold.
    // Semi-join partitions down to small-table keys BEFORE the collect_list
    // aggregation: a 1M-partition table must never materialize its whole
    // partition array in an aggregation buffer just to be discarded by the
    // isLarge filter afterwards.
    val smallKeys = withCounts.where(!col("isLarge")).select(col("dbName"), col("tblName"))
    val partStruct = snap.partitions
      .select(col("databaseName").as("dbName"), col("tableName").as("tblName"),
        struct(snap.partitions.columns.map(snap.partitions(_)).toSeq: _*).as("p"))
      .join(broadcast(smallKeys), Seq("dbName", "tblName"), "left_semi")
      .groupBy("dbName", "tblName")
      .agg(collect_list("p").as("partitionList"))
    val small = withCounts.where(!col("isLarge"))
      .join(partStruct, Seq("dbName", "tblName"), "left_outer")
      .select(
        lit(MessageType.Table).as("messageType"),
        lit(snap.catalogId).as("sourceCatalogId"),
        lit(batchId).as("exportBatchId"),
        to_json(struct(col("table"), coalesce(col("partitionList"), array()).as("partitionList"))).as("payload"),
        lit(null).cast("string").as("s3BucketName"),
        lit(null).cast("string").as("s3ObjectKey"))

    // Large branch: stub message + JSON-lines side-channel per table
    // (key layout mirrors ExportLargeTable.java:96-101: one object per table
    // per run — here a dir partitioned by db/table).
    //
    // With no side channel configured, a table over the threshold would emit
    // a stub whose partitions ride nowhere — the importer would then
    // wholesale-delete the target partitions and create none (silent data
    // loss). Fail fast instead; the check runs on the table-counts plane
    // (one row per table, metadata scale).
    val bucket = sideChannelDir.getOrElse("")
    if (sideChannelDir.isEmpty) {
      val nLarge = withCounts.where(col("isLarge")).limit(1).count()
      require(nLarge == 0L,
        s"table(s) exceed largeTableThreshold=$threshold but no sideChannelDir is configured; " +
          "their partitions would be lost on import — set ReplicationConfig.sideChannelDir")
    }
    sideChannelDir.foreach { dir =>
      val largeKeys = withCounts.where(col("isLarge")).select(col("dbName"), col("tblName"))
      snap.partitions
        .join(broadcast(largeKeys),
          snap.partitions("databaseName") === largeKeys("dbName") &&
            snap.partitions("tableName") === largeKeys("tblName"),
          "left_semi")
        // Cluster rows on the layout keys before the partitioned write:
        // without it every task writes a sliver into every table dir
        // (tasks × tables small files, the metadata-killer at scale — same
        // guard as CatalogSnapshot.writeParquet); with it each table dir
        // gets its task's consolidated files.
        .repartition(col("databaseName"), col("tableName"))
        .write.mode("overwrite")
        .partitionBy("databaseName", "tableName")
        .json(s"$dir/run=$runId")
    }
    val large = withCounts.where(col("isLarge"))
      .select(
        lit(MessageType.LargeTable).as("messageType"),
        lit(snap.catalogId).as("sourceCatalogId"),
        lit(batchId).as("exportBatchId"),
        to_json(struct(
          lit(snap.catalogId).as("catalogId"),
          lit(true).as("largeTable"),
          col("numberOfPartitions"),
          col("table"),
          concat_ws("_",
            date_format(to_date(timestamp_millis(lit(runId))), "yyyy-MM-dd"),
            lit(runId), lit(snap.catalogId), col("dbName"), col("tblName")).as("s3ObjectKey"),
          lit(bucket).as("s3BucketName"))).as("payload"),
        when(lit(bucket.nonEmpty), lit(bucket)).cast("string").as("s3BucketName"),
        concat(lit(s"run=$runId/databaseName="), col("dbName"), lit("/tableName="), col("tblName")).as("s3ObjectKey"))

    // A2 export counters ride the export pass itself via observe() — no
    // extra jobs; consumers read the "export_metrics_<batchId>" observation
    // from QueryExecutionListener/StreamingQueryListener (reference: DDB
    // counter writes per export Lambda, DDBUtil.java:150-157). The batch id
    // in the name keeps multiple runs' exports distinct inside one plan
    // (re-replication composes them).
    dbMsgs.unionByName(small.as[CatalogMessage]).unionByName(large.as[CatalogMessage])
      .observe(s"export_metrics_$batchId",
        count(when(col("messageType") === MessageType.Database, 1)).as("n_databases"),
        count(when(col("messageType") === MessageType.Table, 1)).as("n_tables"),
        count(when(col("messageType") === MessageType.LargeTable, 1)).as("n_large_tables"))
  }

  /** Export-side audit rows (DDBUtil.trackTableExportStatus:150-157,
    * trackDatabaseExportStatus:199-205; table_id = name|db, F3). */
  def exportAudit(
      messages: Dataset[CatalogMessage],
      runId: Long): Dataset[AuditRecord] = {
    import Codecs._
    val parsedTable = from_json(col("payload"), Codecs.tableWithPartitionsSchema)
    val parsedLarge = from_json(col("payload"), Codecs.largeTableSchema)
    val parsedDb = from_json(col("payload"), Codecs.databaseSchema)
    messages.select(
      when(col("messageType") === MessageType.Database, parsedDb("name"))
        .when(col("messageType") === MessageType.Table,
          concat_ws("|", parsedTable.getField("table").getField("name"),
            parsedTable.getField("table").getField("databaseName")))
        .otherwise(concat_ws("|", parsedLarge.getField("table").getField("name"),
          parsedLarge.getField("table").getField("databaseName")))
        .as("entityId"),
      when(col("messageType") === MessageType.Database, lit("database"))
        .otherwise(lit("table")).as("entityKind"),
      lit(runId).as("runId"),
      col("exportBatchId"),
      col("sourceCatalogId").as("catalogId"),
      lit("export").as("action"),
      (col("messageType") === MessageType.LargeTable).as("isLargeTable"),
      col("payload").as("schemaJson"),
      col("s3BucketName"),
      col("s3ObjectKey"),
      lit(null).cast("string").as("error")).as[AuditRecord]
  }
}
