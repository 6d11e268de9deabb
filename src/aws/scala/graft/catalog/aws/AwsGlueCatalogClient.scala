package graft.catalog.aws

import java.time.Instant
import scala.jdk.CollectionConverters._

import software.amazon.awssdk.services.glue.GlueClient
import software.amazon.awssdk.services.glue.model.{
  AlreadyExistsException, BatchCreatePartitionRequest, BatchDeletePartitionRequest,
  Column, CreateDatabaseRequest, CreateTableRequest, Database, DatabaseInput,
  EntityNotFoundException, GetDatabaseRequest, GetDatabasesRequest, GetPartitionsRequest,
  GetTableRequest, GetTablesRequest, GlueException, InternalServiceException,
  OperationTimeoutException, Order, Partition, PartitionInput, PartitionValueList,
  SerDeInfo, StorageDescriptor, Segment, Table, TableInput, UpdateTableRequest}

import graft.catalog.{GlueAlreadyExistsException, GlueCatalogClient, GlueClientFactory,
  GlueEntityNotFoundException, GluePage, GlueSegment, GluePartitionError, GlueThrottlingException}
import graft.model.{GDatabase, GPartition, GTable, SdColumn, SerdeInfo => GSerdeInfo,
  StorageDescriptor => GStorageDescriptor}

/**
 * AWS-SDK-v2 adapter behind the [[graft.catalog.GlueCatalogClient]] seam — the
 * thin mapping from the contract's methods onto real `GlueClient` calls,
 * call-for-call with the reference's GlueUtil:
 *
 *  - getDatabases    ↔ glue.getDatabases + nextToken   (GlueUtil.java:84-105)
 *  - getTables       ↔ glue.getTables + nextToken      (GlueUtil.java:202-228)
 *  - getPartitions   ↔ glue.getPartitions + nextToken  (GlueUtil.java:361-386),
 *                      plus the public API's Segment parameter the reference
 *                      does not use (it fetches serially)
 *  - getDatabase     ↔ glue.getDatabase               (GlueUtil.java:120-140)
 *  - getTable        ↔ glue.getTable                  (GlueUtil.java:283-292)
 *  - createDatabase  ↔ glue.createDatabase            (GlueUtil.java:142-167)
 *  - create/updateTable (skipArchive) ↔ glue.createTable / glue.updateTable
 *                                       (GlueUtil.java:296-345, skipArchive at 292-294)
 *  - batchCreatePartitions ↔ glue.batchCreatePartition, ≤100/call
 *                            (GlueUtil.java:406-420)
 *  - batchDeletePartitions ↔ glue.batchDeletePartition, ≤25/call, identity =
 *                            ordered values list (GlueUtil.java:500-512)
 *
 * COMPILE-FENCED: this source directory is OUTSIDE the default compile (the
 * sandbox has no AWS SDK on the classpath and zero egress). To enable:
 *
 *   1. add the dependency:  libraryDependencies += "software.amazon.awssdk" % "glue" % "2.25.+"
 *   2. build with the flag: GRAFT_AWS_SDK=1 sbt compile
 *      (build.sbt adds src/aws/scala to Compile/unmanagedSourceDirectories
 *      when GRAFT_AWS_SDK is set)
 *   3. point any V2 read/write or connector call at the adapter:
 *        spark.read.format("glue-catalog")
 *          .option("plane", "tables")
 *          .option("factoryClass", "graft.catalog.aws.AwsGlueClientFactory")
 *          .option("catalogId", "123456789012")
 *          .load()
 *
 * Exception mapping (the contract's entity semantics):
 *  - EntityNotFoundException → [[GlueEntityNotFoundException]] on listing
 *    calls; None on point lookups (INCLUDING an absent parent database of a
 *    getTable — the documented contract requirement);
 *  - AlreadyExistsException → [[GlueAlreadyExistsException]];
 *  - throttling/5xx (statusCode 429/5xx, OperationTimeout, InternalService) →
 *    [[GlueThrottlingException]], which [[GlueCatalogClient.withRetry]]
 *    retries with the reference's maxErrorRetry(10) policy
 *    (ExportDatabaseWithTables.java:76-77) — retry stays in the shared
 *    wrapper, NOT here, so mock and live clients share one policy.
 *
 * Times map Instant ↔ epoch-ms (the model keeps `*TimeMs: Option[Long]`).
 * Sort columns: the model's SdColumn(name, colType) carries the Order's
 * column/sortOrder pair with sortOrder printed into colType (an int string);
 * the inverse parse defaults to ascending (1) — catalog-managed detail, not
 * replicated content (Projection drops it from inputs either way).
 */
final class AwsGlueCatalogClient(val catalogId: String, glue: GlueClient)
    extends GlueCatalogClient {

  // ------------------------------------------------------------- fault map

  private def mapFaults[T](op: => T): T =
    try op catch {
      case e: EntityNotFoundException => throw new GlueEntityNotFoundException(e.getMessage)
      case e: AlreadyExistsException => throw new GlueAlreadyExistsException(e.getMessage)
      case e: OperationTimeoutException => throw new GlueThrottlingException(e.getMessage)
      case e: InternalServiceException => throw new GlueThrottlingException(e.getMessage)
      case e: GlueException if e.statusCode == 429 || e.statusCode >= 500 =>
        throw new GlueThrottlingException(e.getMessage)
    }

  private def pointLookup[T](op: => T): Option[T] =
    // Absence → None per the contract doc on GlueCatalogClient.getTable —
    // including EntityNotFound raised for the PARENT database.
    try Some(op) catch { case _: EntityNotFoundException => None }

  // ------------------------------------------------------------- reads

  override def getDatabases(nextToken: Option[String]): GluePage[GDatabase] = mapFaults {
    val b = GetDatabasesRequest.builder().catalogId(catalogId)
    nextToken.foreach(b.nextToken)
    val resp = glue.getDatabases(b.build())
    GluePage(resp.databaseList.asScala.toSeq.map(fromDatabase), Option(resp.nextToken))
  }

  override def getTables(databaseName: String, nextToken: Option[String]): GluePage[GTable] = mapFaults {
    val b = GetTablesRequest.builder().catalogId(catalogId).databaseName(databaseName)
    nextToken.foreach(b.nextToken)
    val resp = glue.getTables(b.build())
    GluePage(resp.tableList.asScala.toSeq.map(fromTable(databaseName, _)), Option(resp.nextToken))
  }

  override def getPartitions(databaseName: String, tableName: String, nextToken: Option[String],
      segment: Option[GlueSegment]): GluePage[GPartition] = mapFaults {
    val b = GetPartitionsRequest.builder()
      .catalogId(catalogId).databaseName(databaseName).tableName(tableName)
    nextToken.foreach(b.nextToken)
    segment.foreach(s => b.segment(Segment.builder()
      .segmentNumber(s.segmentNumber).totalSegments(s.totalSegments).build()))
    val resp = glue.getPartitions(b.build())
    GluePage(resp.partitions.asScala.toSeq.map(fromPartition(databaseName, tableName, _)),
      Option(resp.nextToken))
  }

  override def getDatabase(name: String): Option[GDatabase] = mapFaults {
    pointLookup(glue.getDatabase(
      GetDatabaseRequest.builder().catalogId(catalogId).name(name).build()).database)
      .map(fromDatabase)
  }

  override def getTable(databaseName: String, name: String): Option[GTable] = mapFaults {
    pointLookup(glue.getTable(GetTableRequest.builder()
      .catalogId(catalogId).databaseName(databaseName).name(name).build()).table)
      .map(fromTable(databaseName, _))
  }

  // ------------------------------------------------------------- writes

  override def createDatabase(db: GDatabase): Unit = mapFaults {
    val input = DatabaseInput.builder().name(db.name)
    db.description.foreach(input.description)
    db.locationUri.foreach(input.locationUri)
    if (db.parameters.nonEmpty) input.parameters(db.parameters.asJava)
    glue.createDatabase(CreateDatabaseRequest.builder()
      .catalogId(catalogId).databaseInput(input.build()).build())
  }

  override def createTable(table: GTable): Unit = mapFaults {
    glue.createTable(CreateTableRequest.builder()
      .catalogId(catalogId).databaseName(table.databaseName)
      .tableInput(toTableInput(table)).build())
  }

  override def updateTable(table: GTable, skipArchive: Boolean): Unit = mapFaults {
    glue.updateTable(UpdateTableRequest.builder()
      .catalogId(catalogId).databaseName(table.databaseName)
      .tableInput(toTableInput(table))
      .skipArchive(skipArchive) // GlueUtil.java:292-294
      .build())
  }

  override def batchCreatePartitions(databaseName: String, tableName: String,
      parts: Seq[GPartition]): Seq[GluePartitionError] = mapFaults {
    require(parts.size <= graft.catalog.GlueLimits.BatchCreatePartitions,
      s"BatchCreatePartition accepts at most ${graft.catalog.GlueLimits.BatchCreatePartitions} partitions")
    val resp = glue.batchCreatePartition(BatchCreatePartitionRequest.builder()
      .catalogId(catalogId).databaseName(databaseName).tableName(tableName)
      .partitionInputList(parts.map(toPartitionInput).asJava).build())
    resp.errors.asScala.toSeq.map(e => GluePartitionError(
      e.partitionValues.asScala.toSeq,
      Option(e.errorDetail).map(_.errorCode).getOrElse("Unknown"),
      Option(e.errorDetail).map(_.errorMessage).getOrElse("")))
  }

  override def batchDeletePartitions(databaseName: String, tableName: String,
      values: Seq[Seq[String]]): Seq[GluePartitionError] = mapFaults {
    require(values.size <= graft.catalog.GlueLimits.BatchDeletePartitions,
      s"BatchDeletePartition accepts at most ${graft.catalog.GlueLimits.BatchDeletePartitions} keys")
    val resp = glue.batchDeletePartition(BatchDeletePartitionRequest.builder()
      .catalogId(catalogId).databaseName(databaseName).tableName(tableName)
      .partitionsToDelete(values.map(v =>
        PartitionValueList.builder().values(v.asJava).build()).asJava).build())
    resp.errors.asScala.toSeq.map(e => GluePartitionError(
      e.partitionValues.asScala.toSeq,
      Option(e.errorDetail).map(_.errorCode).getOrElse("Unknown"),
      Option(e.errorDetail).map(_.errorMessage).getOrElse("")))
  }

  // ------------------------------------------------------------- model maps

  private def ms(i: Instant): Long = i.toEpochMilli
  private def instant(msEpoch: Long): Instant = Instant.ofEpochMilli(msEpoch)

  private def fromDatabase(d: Database): GDatabase = GDatabase(
    name = d.name,
    description = Option(d.description),
    locationUri = Option(d.locationUri),
    parameters = Option(d.parameters).map(_.asScala.toMap).getOrElse(Map.empty),
    createTimeMs = Option(d.createTime).map(ms))

  private def fromTable(db: String, t: Table): GTable = GTable(
    name = t.name,
    databaseName = Option(t.databaseName).getOrElse(db),
    description = Option(t.description),
    owner = Option(t.owner),
    createTimeMs = Option(t.createTime).map(ms),
    updateTimeMs = Option(t.updateTime).map(ms),
    lastAccessTimeMs = Option(t.lastAccessTime).map(ms),
    retention = Option(t.retention).map(_.intValue).getOrElse(0),
    storageDescriptor = Option(t.storageDescriptor).map(fromSd),
    partitionKeys = Option(t.partitionKeys).map(_.asScala.toSeq.map(fromColumn)).getOrElse(Seq.empty),
    tableType = Option(t.tableType),
    viewOriginalText = Option(t.viewOriginalText),
    viewExpandedText = Option(t.viewExpandedText),
    parameters = Option(t.parameters).map(_.asScala.toMap).getOrElse(Map.empty),
    createdBy = Option(t.createdBy))

  private def fromPartition(db: String, tbl: String, p: Partition): GPartition = GPartition(
    values = p.values.asScala.toSeq,
    databaseName = Option(p.databaseName).getOrElse(db),
    tableName = Option(p.tableName).getOrElse(tbl),
    creationTimeMs = Option(p.creationTime).map(ms),
    lastAccessTimeMs = Option(p.lastAccessTime).map(ms),
    storageDescriptor = Option(p.storageDescriptor).map(fromSd),
    parameters = Option(p.parameters).map(_.asScala.toMap).getOrElse(Map.empty))

  private def fromColumn(c: Column): SdColumn =
    SdColumn(c.name, c.`type`, Option(c.comment))

  private def fromOrder(o: Order): SdColumn =
    SdColumn(o.column, Option(o.sortOrder).map(_.toString).getOrElse("1"))

  private def fromSd(sd: StorageDescriptor): GStorageDescriptor = GStorageDescriptor(
    columns = Option(sd.columns).map(_.asScala.toSeq.map(fromColumn)).getOrElse(Seq.empty),
    location = Option(sd.location),
    inputFormat = Option(sd.inputFormat),
    outputFormat = Option(sd.outputFormat),
    compressed = Option(sd.compressed).exists(_.booleanValue),
    numberOfBuckets = Option(sd.numberOfBuckets).map(_.intValue).getOrElse(-1),
    serdeInfo = Option(sd.serdeInfo).map(s => GSerdeInfo(
      Option(s.serializationLibrary),
      Option(s.parameters).map(_.asScala.toMap).getOrElse(Map.empty))),
    bucketColumns = Option(sd.bucketColumns).map(_.asScala.toSeq).getOrElse(Seq.empty),
    sortColumns = Option(sd.sortColumns).map(_.asScala.toSeq.map(fromOrder)).getOrElse(Seq.empty),
    parameters = Option(sd.parameters).map(_.asScala.toMap).getOrElse(Map.empty),
    storedAsSubDirectories = Option(sd.storedAsSubDirectories).exists(_.booleanValue))

  private def toColumn(c: SdColumn): Column = {
    val b = Column.builder().name(c.name).`type`(c.colType)
    c.comment.foreach(b.comment)
    b.build()
  }

  private def toOrder(c: SdColumn): Order =
    Order.builder().column(c.name).sortOrder(c.colType.toIntOption.getOrElse(1)).build()

  private def toSd(sd: GStorageDescriptor): StorageDescriptor = {
    val b = StorageDescriptor.builder()
      .columns(sd.columns.map(toColumn).asJava)
      .compressed(sd.compressed)
      .numberOfBuckets(sd.numberOfBuckets)
      .bucketColumns(sd.bucketColumns.asJava)
      .sortColumns(sd.sortColumns.map(toOrder).asJava)
      .parameters(sd.parameters.asJava)
      .storedAsSubDirectories(sd.storedAsSubDirectories)
    sd.location.foreach(b.location)
    sd.inputFormat.foreach(b.inputFormat)
    sd.outputFormat.foreach(b.outputFormat)
    sd.serdeInfo.foreach(s => b.serdeInfo {
      val sb = SerDeInfo.builder().parameters(s.parameters.asJava)
      s.serializationLibrary.foreach(sb.serializationLibrary)
      sb.build()
    })
    b.build()
  }

  /** TableInput carries only the writable projection — the same field set
    * graft.operators.Projection keeps (Projection.scala, P3): the
    * catalog-managed createTime/updateTime/createdBy never round-trip. */
  private def toTableInput(t: GTable): TableInput = {
    val b = TableInput.builder().name(t.name).retention(t.retention)
    t.description.foreach(b.description)
    t.owner.foreach(b.owner)
    t.lastAccessTimeMs.foreach(msEpoch => b.lastAccessTime(instant(msEpoch)))
    t.storageDescriptor.foreach(sd => b.storageDescriptor(toSd(sd)))
    if (t.partitionKeys.nonEmpty) b.partitionKeys(t.partitionKeys.map(toColumn).asJava)
    t.tableType.foreach(b.tableType)
    t.viewOriginalText.foreach(b.viewOriginalText)
    t.viewExpandedText.foreach(b.viewExpandedText)
    if (t.parameters.nonEmpty) b.parameters(t.parameters.asJava)
    b.build()
  }

  private def toPartitionInput(p: GPartition): PartitionInput = {
    val b = PartitionInput.builder().values(p.values.asJava)
    p.lastAccessTimeMs.foreach(msEpoch => b.lastAccessTime(instant(msEpoch)))
    p.storageDescriptor.foreach(sd => b.storageDescriptor(toSd(sd)))
    if (p.parameters.nonEmpty) b.parameters(p.parameters.asJava)
    b.build()
  }
}

/**
 * The [[GlueClientFactory]] a deployment names in the V2 `factoryClass`
 * option (String-constructor form: the option's `catalogId` value arrives
 * here). One `GlueClient` per executor JVM, built lazily on first use and
 * reused across tasks — the SDK client is thread-safe and holds the
 * connection pool; only this small serializable factory crosses the wire.
 */
final class AwsGlueClientFactory(catalogId: String) extends GlueClientFactory {
  @transient private lazy val glue: GlueClient = GlueClient.builder().build()
  override def client(): GlueCatalogClient = new AwsGlueCatalogClient(catalogId, glue)
}
