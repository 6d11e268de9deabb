package graft.run

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.codec.Codecs
import graft.codec.Codecs._
import graft.model._
import graft.operators._
import graft.sources.CatalogSnapshot

/** Per-run configuration. Run/batch ids are injected (not wall-clock) so runs
  * are deterministic — the reference stamps System.currentTimeMillis()
  * everywhere (SNSUtil.java:91-92); SURVEY §7.4.6. */
final case class ReplicationConfig(
    runId: Long,
    prefixes: Seq[String] = Seq.empty,
    largeTableThreshold: Int = Exporter.DefaultLargeTableThreshold,
    minimalPartitionDiff: Boolean = false,
    sideChannelDir: Option[String] = None,
    /** SQL boolean expression over the message plane (messageType, payload,
      * …) marking messages that FAIL at apply time. The reference's apply
      * failures are Glue API exceptions routed to the DLQ
      * (GDCUtil.java:112-116); against a snapshot target the apply is pure
      * set algebra and cannot throw, so failure injection is how specs (and
      * chaos runs) exercise the DLQ path. A live catalog sink maps real API
      * errors onto the same DeadLetter rows. */
    applyFailureExpr: Option[String] = None) {
  def batchId: String = runId.toString
}

final case class ReplicationResult(
    target: CatalogSnapshot,
    messages: Dataset[CatalogMessage],
    actions: DataFrame,
    audit: Dataset[AuditRecord],
    deadLetters: Dataset[DeadLetter])

/** The import decision, before any apply: the three per-plane action frames
  * (entity columns + `action`), the dead letters, and the unified action log.
  * Both apply paths consume this one plan — [[Applier]] folds it into a
  * snapshot (fixture mode), graft.catalog.GlueSink plays it against a live
  * catalog client — so live mode cannot drift from the oracle-checked
  * semantics. */
final case class ImportPlan(
    dbActions: DataFrame,
    tableActions: DataFrame,
    partActions: DataFrame,
    deadLetters: Dataset[DeadLetter],
    actions: DataFrame,
    /** The message plane all frames above derive from, pinned eagerly and
      * lineage-free (localCheckpoint) — consumers re-read materialized
      * blocks, never replay the export, and nothing registers in the
      * CacheManager (no cache to leak across a long session). */
    messages: Dataset[CatalogMessage])

/**
 * End-to-end replication: planner → export → message plane → import → apply,
 * one Spark job. The reference runs this as 6 Lambdas over SNS/SQS
 * (README.md:28-36); here the SNS/SQS hops are the exported-messages dataset
 * and process boundaries become stage boundaries.
 *
 * The import side parses the wire-format payloads back (never peeking at the
 * source snapshot directly), so the Gson-equivalent JSON round-trip is on the
 * critical path and exercised by every e2e test.
 */
object ReplicationJob {

  /** Export phase: select databases by prefix, emit the message plane. */
  def export(
      spark: SparkSession,
      src: CatalogSnapshot,
      cfg: ReplicationConfig): Dataset[CatalogMessage] = {
    val selected = Planner.selectDatabases(src.databases, cfg.prefixes)
    Exporter.exportMessages(spark, src, selected, cfg.batchId, cfg.runId,
      cfg.sideChannelDir, cfg.largeTableThreshold)
  }

  /** Schema of the side-channel JSON data files: partitionBy("databaseName",
    * "tableName") moves those two columns out of the data and into the
    * directory layout, so the on-disk lines carry the remaining fields only. */
  private val sideChannelDataSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(
      Codecs.partitionSchema.filterNot(f => f.name == "databaseName" || f.name == "tableName"))

  /** Read large-table partitions back from the side channel. `paths` are the
    * per-table leaf dirs (`.../run=N/databaseName=db/tableName=t`) recorded on
    * the stub messages; `basePath` is their common run dir, which lets Spark
    * recover databaseName/tableName from the directory layout (they are NOT in
    * the data files — see the writer in Exporter). Partition-dir values are
    * cast to string explicitly: inference would happily type tableName="42"
    * as int. */
  private def readSideChannel(
      spark: SparkSession, basePath: String, paths: Seq[String]): Dataset[GPartition] =
    spark.read
      .schema(sideChannelDataSchema)
      .option("basePath", basePath)
      .json(paths: _*)
      .select(
        col("values"), col("databaseName").cast("string"), col("tableName").cast("string"),
        col("creationTimeMs"), col("lastAccessTimeMs"), col("storageDescriptor"), col("parameters"))
      .as[GPartition]

  /** Parse the message plane back into entity planes (import-side S7/S8 + P6
    * dispatch + F2 parse). Malformed payloads → dead letters
    * (ImportDatabaseOrTable.java:117-132). The five returned frames all scan
    * `messages` — callers pass a PINNED frame (planImport localCheckpoints
    * before calling) so those scans hit materialized blocks, not a replayed
    * export. */
  def parseMessages(
      spark: SparkSession,
      messages: Dataset[CatalogMessage]): (Dataset[GDatabase], Dataset[GTable], Dataset[GPartition], DataFrame, Dataset[DeadLetter]) = {

    val cached = messages

    // Each type's parse is pinned ONCE (eager localCheckpoint): the from_json
    // over KB-sized payloads against the big nested schemas is the dominant
    // node of the whole import body, and its frame has MULTIPLE consumers —
    // tables AND exploded partitions read twpRaw, dead letters reuse every
    // type's parse verdict, and a multi-writer caller (foreachBatch
    // committing 3 state planes + DLQ per micro-batch) evaluates the plan
    // once per write. Without the pin that's up to ~10 parse passes per
    // micro-batch; with it, exactly one per type. Blocks are scoped to the
    // batch and sized by it (the micro-batch / message-plane row count),
    // same discipline as the `messages` pin the caller already does.
    val dbRaw = cached.where(col("messageType") === MessageType.Database)
      .withColumn("parsed", from_json(col("payload"), Codecs.databaseSchema))
      .localCheckpoint(true)
    val dbs = dbRaw.where(col("parsed.name").isNotNull).select(col("parsed.*")).as[GDatabase]

    val twpRaw = cached.where(col("messageType") === MessageType.Table)
      .withColumn("parsed", from_json(col("payload"), Codecs.tableWithPartitionsSchema))
      .localCheckpoint(true)
    val smallTables = twpRaw.where(col("parsed.table.name").isNotNull)
      .select(col("parsed.table.*")).as[GTable]
    val smallParts = twpRaw.where(col("parsed.table.name").isNotNull)
      .select(explode(col("parsed.partitionList")).as("p")).select(col("p.*")).as[GPartition]

    val largeRaw = cached.where(col("messageType") === MessageType.LargeTable)
      .withColumn("parsed", from_json(col("payload"), Codecs.largeTableSchema))
      .localCheckpoint(true)
    val largeTables = largeRaw.where(col("parsed.table.name").isNotNull)
      .select(col("parsed.table.*")).as[GTable]
    // Large-table partitions ride the side-channel (S6): JSON-lines files under
    // bucket/key recorded on the message. The run-dir layout is deterministic
    // (`run=$runId/databaseName=…/tableName=…`), so one metadata-only collect
    // over the distinct run dirs (one row per run, not per table) plans the
    // read; partition identity is recovered from the directory layout via
    // basePath (the data files don't carry db/table — see readSideChannel).
    val runDirs = largeRaw
      .where(col("s3BucketName").isNotNull && col("s3ObjectKey").isNotNull)
      .select(concat_ws("/", col("s3BucketName"),
        regexp_extract(col("s3ObjectKey"), "^(run=[^/]+)/", 1)).as("runDir"))
      .distinct().collect().map(_.getString(0))
    // Scope to tables present in THIS message set: the run dir holds every
    // large table of the run, but the caller may import a filtered subset.
    val largeKeys = largeTables.select(col("databaseName"), col("name").as("tableName"))
    val largeParts: Dataset[GPartition] =
      if (runDirs.isEmpty) spark.emptyDataset[GPartition]
      else runDirs.map(d => readSideChannel(spark, d, Seq(d)))
        .reduce(_ unionByName _)
        .join(broadcast(largeKeys), Seq("databaseName", "tableName"), "left_semi")
        .as[GPartition]

    // Tables whose message arrived this run — drives J3 scoping (a table
    // message with zero partitions still wholesale-deletes target partitions).
    val exportedTables = smallTables.select(col("databaseName"), col("name").as("tableName"))
      .unionByName(largeTables.select(col("databaseName"), col("name").as("tableName")))
      .distinct()

    // A message is dead iff its type is unknown OR its payload doesn't parse
    // under that type's schema. The unknown-type guard matters: the entity
    // parses above filter on EXACT type constants, so without it a message
    // with (say) messageType "Table" and a parseable payload would be
    // neither imported nor dead-lettered — silently lost. Malformed rows
    // reuse the PINNED per-type parse verdicts (dbRaw/twpRaw/largeRaw
    // above) instead of a fourth whole-plane from_json pass.
    // coalesce: a NULL messageType (e.g. a corrupt line that parsed to an
    // all-null row) makes `isin` NULL, and `where(!NULL)` would DROP the row
    // — neither imported nor dead-lettered. NULL type is unknown type.
    val knownType = coalesce(col("messageType").isin(
      MessageType.Database, MessageType.Table, MessageType.LargeTable), lit(false))
    def asDead(df: DataFrame, error: String): Dataset[DeadLetter] =
      df.select(col("messageType"), col("payload"), col("exportBatchId"),
        col("sourceCatalogId"), lit(error).as("error"),
        col("s3BucketName"), col("s3ObjectKey")).as[DeadLetter]
    val dead = asDead(cached.where(!knownType).toDF(), "unknown messageType")
      .unionByName(asDead(dbRaw.where(col("parsed.name").isNull), "malformed payload"))
      .unionByName(asDead(twpRaw.where(col("parsed.table.name").isNull), "malformed payload"))
      .unionByName(asDead(largeRaw.where(col("parsed.table.name").isNull), "malformed payload"))

    (dbs, smallTables.unionByName(largeTables).as[GTable],
      smallParts.unionByName(largeParts).as[GPartition], exportedTables, dead)
  }

  /** Plan the import: diff parsed entities against the target snapshot into
    * per-plane action frames, databases → tables → partitions (topological
    * order replacing the reference's exception-driven retry,
    * GDCUtil.java:47-57). Pure planning — no apply happens here. */
  def planImport(
      spark: SparkSession,
      messages: Dataset[CatalogMessage],
      tgt: CatalogSnapshot,
      cfg: ReplicationConfig): ImportPlan = {

    // Pin the message plane once: every downstream frame (entity parses,
    // dead letters, failure marking) reads the materialized blocks; the
    // export lineage never replays and no CacheManager entry is left behind.
    val pinned = messages.localCheckpoint(true)

    // Apply-time failures (injected in fixture mode, real API errors in a live
    // sink) dead-letter the WHOLE message — the reference's DLQ granularity —
    // and the message is excluded from this import; re-drive converges later.
    val (live, applyDead) = cfg.applyFailureExpr match {
      case None => (pinned, spark.emptyDataset[DeadLetter])
      case Some(e) =>
        // The failure expression may be nondeterministic (chaos injection) —
        // pin the marked frame so BOTH branches read the same verdicts.
        val marked = pinned.withColumn("_fail", coalesce(expr(e), lit(false))).localCheckpoint(true)
        val failed = marked.where(col("_fail"))
          .select(col("messageType"), col("payload"), col("exportBatchId"),
            col("sourceCatalogId"), lit("apply failure").as("error"),
            col("s3BucketName"), col("s3ObjectKey")).as[DeadLetter]
        (marked.where(!col("_fail")).drop("_fail").as[CatalogMessage], failed)
    }

    val (srcDbs, srcTables, srcParts, exportedTables, parseDead) = parseMessages(spark, live)
    val dead = parseDead.unionByName(applyDead)

    // Tables may arrive for databases absent on the target: create those too
    // (the reference creates-then-retries on EntityNotFoundException).
    val implicitDbs = srcTables.select(col("databaseName").as("name")).distinct()
      .join(srcDbs.select(col("name")), Seq("name"), "left_anti")
      .withColumn("description", lit(null).cast("string"))
      .withColumn("locationUri", lit(null).cast("string"))
      .withColumn("parameters", map().cast("map<string,string>"))
      .withColumn("createTimeMs", lit(null).cast("long"))
      .as[GDatabase]

    val dbActions = Importer.diffDatabases(srcDbs.unionByName(implicitDbs).dropDuplicates("name").as[GDatabase], tgt.databases)
    val tableActions = Importer.diffTables(srcTables, tgt.tables)
    val partActions = Importer.reconcilePartitionsForTables(
      exportedTables, srcParts, tgt.partitions, cfg.minimalPartitionDiff)

    val actions =
      dbActions.select(lit("database").as("entityKind"), col("name").as("databaseName"),
          lit(null).cast("string").as("tableName"), lit(null).cast("array<string>").as("partitionValues"), col("action"))
        .unionByName(tableActions.select(lit("table").as("entityKind"), col("databaseName"),
          col("name").as("tableName"), lit(null).cast("array<string>").as("partitionValues"), col("action")))
        .unionByName(partActions.select(lit("partition").as("entityKind"), col("databaseName"),
          col("tableName"), col("values").as("partitionValues"), col("action")))

    ImportPlan(dbActions, tableActions, partActions, dead, actions, pinned)
  }

  /** Import-side audit rows from an action log — DDBUtil.java:54-65's item
    * shape (entity id = `name|db` for tables, `db` for databases). Shared by
    * the fixture fold and the live sink. */
  def importAudit(actions: DataFrame, cfg: ReplicationConfig, catalogId: String): Dataset[AuditRecord] =
    actions.select(
      when(col("entityKind") === "database", col("databaseName"))
        .otherwise(concat_ws("|", col("tableName"), col("databaseName"))).as("entityId"),
      col("entityKind"),
      lit(cfg.runId).as("runId"),
      lit(cfg.batchId).as("exportBatchId"),
      lit(catalogId).as("catalogId"),
      col("action"),
      lit(false).as("isLargeTable"),
      lit(null).cast("string").as("schemaJson"),
      lit(null).cast("string").as("s3BucketName"),
      lit(null).cast("string").as("s3ObjectKey"),
      lit(null).cast("string").as("error")).as[AuditRecord]

  /** Import phase: plan, then fold the actions into the target snapshot
    * (fixture-mode apply; live mode plays the same plan through GlueSink). */
  def importMessages(
      spark: SparkSession,
      messages: Dataset[CatalogMessage],
      tgt: CatalogSnapshot,
      cfg: ReplicationConfig): ReplicationResult = {
    val plan = planImport(spark, messages, tgt, cfg)
    val newDbs = Applier.applyDatabases(tgt.databases, plan.dbActions)
    val newTables = Applier.applyTables(tgt.tables, plan.tableActions)
    val newParts = Applier.applyPartitions(tgt.partitions, plan.partActions)
    val actions = plan.actions
    val audit = importAudit(actions, cfg, tgt.catalogId)

    ReplicationResult(
      CatalogSnapshot(tgt.catalogId, newDbs, newTables, newParts),
      plan.messages, actions, audit, plan.deadLetters)
  }

  /** Full pipeline: source snapshot → message plane → target snapshot. The
    * audit plane carries BOTH sides: export rows (DDBUtil.java:150-157) and
    * import action rows (DDBUtil.java:54-65), keyed alike so "latest state
    * per entity" windows span the whole run. */
  def replicate(
      spark: SparkSession,
      src: CatalogSnapshot,
      tgt: CatalogSnapshot,
      cfg: ReplicationConfig): ReplicationResult = {
    val messages = export(spark, src, cfg)
    val res = importMessages(spark, messages, tgt, cfg)
    // res.messages is the plan's pinned plane — audit reads blocks, not a
    // second export run.
    res.copy(audit =
      Exporter.exportAudit(res.messages, cfg.runId).unionByName(res.audit).as[AuditRecord])
  }

  /** SNS fan-out (README.md:230-236): every target account subscribes to the
    * SAME topic, so the reference exports once and each target imports
    * independently. Here: the message plane materializes once (persisted —
    * N imports share one export computation, the scan-amortization the SNS
    * topic gives the reference) and each target folds it in isolation;
    * results are per-target, failures on one target never touch another.
    * Caller unpersists via the returned cleanup after consuming results. */
  def replicateFanOut(
      spark: SparkSession,
      src: CatalogSnapshot,
      targets: Seq[CatalogSnapshot],
      cfg: ReplicationConfig): (Seq[ReplicationResult], () => Unit) = {
    val messages = export(spark, src, cfg)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val exportAudit = Exporter.exportAudit(messages, cfg.runId)
    val results = targets.map { tgt =>
      val res = importMessages(spark, messages, tgt, cfg)
      res.copy(audit = exportAudit.unionByName(res.audit).as[AuditRecord])
    }
    (results, () => { messages.unpersist(); () })
  }
}

/**
 * DLQ re-drive: re-run the import over dead-lettered messages through the
 * SAME code path as the first attempt — the reference's
 * DLQImportDatabaseOrTable/DLQImportLargeTable Lambdas
 * (DLQImportDatabaseOrTable.java:126-166) poll the DLQ and call the identical
 * per-message import logic. Dead letters carry the complete original message
 * (payload + side-channel coords), so reconstruction is a projection; still-
 * failing messages dead-letter again in the returned result (at-least-once,
 * never at-most-once).
 */
object ReDriveJob {

  /** Rebuild the message plane from dead letters. */
  def messagesOf(deadLetters: Dataset[DeadLetter]): Dataset[CatalogMessage] =
    deadLetters.select(
      col("messageType"), col("sourceCatalogId"), col("exportBatchId"),
      col("payload"), col("s3BucketName"), col("s3ObjectKey")).as[CatalogMessage]

  /** Re-import dead letters into `tgt`. Pass a cfg WITHOUT the failure
    * condition that produced them (in live mode: after the transient API
    * fault passed); messages that fail again land in the result's
    * deadLetters. */
  def redrive(
      spark: SparkSession,
      deadLetters: Dataset[DeadLetter],
      tgt: CatalogSnapshot,
      cfg: ReplicationConfig): ReplicationResult =
    ReplicationJob.importMessages(spark, messagesOf(deadLetters), tgt, cfg)
}
