package graft.catalog

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.codec.Codecs
import graft.codec.Codecs._
import graft.model._
import graft.operators.Projection
import graft.run.{ImportPlan, ReplicationConfig, ReplicationJob}
import graft.sources.CatalogSnapshot

/**
 * Live-catalog SOURCE: materialize a [[CatalogSnapshot]] from a
 * [[GlueCatalogClient]].
 *
 * The reference runs its pagination loops on one thread inside a Lambda
 * (GlueUtil.getDatabases:84-105, getTables:202-228, getPartitions:361-386);
 * at 10k tables / 1M partitions that serial chain is the bottleneck. Here
 * only the database list is fetched on the driver (metadata scale, one
 * paginated loop); the per-database table fetches and per-table partition
 * fetches are DISTRIBUTED — each executor task walks the nextToken loop for
 * its slice of keys, so fetch throughput scales with the cluster, bounded
 * only by service-side rate limits (which the retry policy absorbs).
 *
 * Every fetched plane is pinned eagerly (localCheckpoint) so the service is
 * read exactly once per snapshot — downstream actions never re-fetch, giving
 * the same point-in-time isolation the parquet fixture snapshot has (and
 * subsuming the reference's defensive re-fetch, ExportLargeTable.java:161-177).
 */
object GlueCatalogSource {

  /** `partitionSegments` > 1 splits every table's partition scan into that
    * many disjoint service-side segments, each fetched by its own task — the
    * knob that keeps one million-partition table from bounding snapshot time
    * by a single pagination chain. 1 (default) fetches each table in one
    * chain, matching the reference's serial loop per table. */
  def snapshot(spark: SparkSession, factory: GlueClientFactory, cfg: GlueSinkConfig = GlueSinkConfig(),
      partitionSegments: Int = 1): CatalogSnapshot = {
    require(partitionSegments >= 1, s"partitionSegments must be >= 1, got $partitionSegments")
    import spark.implicits._
    def wrap(c: GlueCatalogClient) = GlueCatalogClient.withRetry(c, cfg.maxErrorRetry, cfg.retryDelayMs)

    val driverClient = wrap(factory.client())
    val catalogId = driverClient.catalogId
    val dbs = GlueCatalogClient.paginate(driverClient.getDatabases)

    val slots = math.max(1, math.min(math.max(dbs.size, 1), spark.sparkContext.defaultParallelism))
    val dbNames = spark.createDataset(dbs.map(_.name)).repartition(slots)
    val tables = dbNames.mapPartitions { names =>
      val c = wrap(factory.client())
      // A database dropped between the driver's GetDatabases and this task's
      // GetTables throws EntityNotFoundException (real-API behavior) — that's
      // an empty table set for the vanished db, not a snapshot failure.
      names.flatMap { db =>
        try GlueCatalogClient.paginate(c.getTables(db, _))
        catch { case _: GlueEntityNotFoundException => Seq.empty[GTable] }
      }
    }.localCheckpoint(true)

    val parts = fetchPartitions(spark, factory, cfg,
      tables.select(col("databaseName"), col("name")).as[(String, String)], partitionSegments)

    CatalogSnapshot(catalogId, spark.createDataset(dbs), tables, parts)
  }

  /** Pruned live state for a BOUNDED message set: point gets for exactly the
    * databases and tables named (the reference's per-message GetDatabase /
    * GetTable lookups, GlueUtil.java:120-140,283-292) plus partition pages
    * for those tables only. This is the per-micro-batch fetch shape — N
    * messages cost O(N) point calls plus their partition pages, never a
    * full-catalog crawl per batch. */
  def snapshotForKeys(
      spark: SparkSession,
      factory: GlueClientFactory,
      cfg: GlueSinkConfig,
      dbNames: Seq[String],
      tableKeys: Seq[(String, String)],
      partitionSegments: Int = 1): CatalogSnapshot = {
    import spark.implicits._
    def wrap(c: GlueCatalogClient) = GlueCatalogClient.withRetry(c, cfg.maxErrorRetry, cfg.retryDelayMs)
    val catalogId = factory.client().catalogId
    val par = spark.sparkContext.defaultParallelism
    val dbs = spark.createDataset(dbNames.distinct).repartition(par)
      .mapPartitions { it => val c = wrap(factory.client()); it.flatMap(c.getDatabase) }
      .localCheckpoint(true)
    val keysDs = spark.createDataset(tableKeys.distinct).repartition(par)
    val tables = keysDs
      .mapPartitions { it => val c = wrap(factory.client()); it.flatMap { case (d, t) => c.getTable(d, t) } }
      .localCheckpoint(true)
    CatalogSnapshot(catalogId, dbs, tables,
      fetchPartitions(spark, factory, cfg, keysDs, partitionSegments))
  }

  private def fetchPartitions(
      spark: SparkSession,
      factory: GlueClientFactory,
      cfg: GlueSinkConfig,
      tableKeys: Dataset[(String, String)],
      partitionSegments: Int): Dataset[GPartition] = {
    import spark.implicits._
    require(partitionSegments >= 1, s"partitionSegments must be >= 1, got $partitionSegments")
    def wrap(c: GlueCatalogClient) = GlueCatalogClient.withRetry(c, cfg.maxErrorRetry, cfg.retryDelayMs)
    val segments: Seq[Int] =
      if (partitionSegments == 1) Seq(-1) else 0 until partitionSegments
    tableKeys
      .flatMap { case (db, tbl) => segments.map(segNo => (db, tbl, segNo)) }
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { keys =>
        val c = wrap(factory.client())
        keys.flatMap { case (db, tbl, segNo) =>
          val seg = if (segNo < 0) None else Some(GlueSegment(segNo, partitionSegments))
          // A table absent on the target (about to be CREATED by the messages
          // this pruned fetch serves — snapshotForKeys names tables straight
          // from the batch) makes the service throw EntityNotFoundException,
          // not return an empty page. That's an empty partition set here, not
          // a task failure.
          try GlueCatalogClient.paginate(c.getPartitions(db, tbl, _, seg))
          catch { case _: GlueEntityNotFoundException => Seq.empty[GPartition] }
        }
      }.localCheckpoint(true)
  }
}

/** Sink options — the reference's deployment knobs:
  * `skipArchive` = SKIP_TABLE_ARCHIVE env (ImportDatabaseOrTable.java:47-48),
  * `maxErrorRetry` = SDK client retry config (ExportDatabaseWithTables.java:
  * 76-77), `retryDelayMs` = backoff base (0 in tests). */
final case class GlueSinkConfig(
    skipArchive: Boolean = false,
    maxErrorRetry: Int = 10,
    retryDelayMs: Long = 0L,
    /** Skew fan-out for the partition batch sink: each table's rows spread
      * over up to this many tasks (salt = hash(values) mod N), so ONE
      * million-partition table no longer serializes its whole batch-call
      * chain behind a single task. 1 = co-locate each table in one task (the
      * strictest chunk packing: no partial chunks beyond the last). Salting
      * costs at most N-1 extra partial batch calls per table — size it to
      * the cluster's cores for degenerate catalogs, leave at 1 for balanced
      * ones. Identity stays intact either way: the salt is a function of the
      * full `values` key, so a delete+create of the SAME identity lands in
      * the same task and keeps its delete-first ordering. */
    partitionSalt: Int = 1)

/** Per-entity (or per-batch, for partitions) apply outcome — the reference's
  * TableReplicationStatus / DBReplicationStatus planes (util/
  * TableReplicationStatus.java:13-27) as one status dataset. `n` is the batch
  * size (1 for point calls); `nErrors` counts per-partition errors inside a
  * batch. */
final case class LiveApplyStatus(
    entityKind: String,
    databaseName: String,
    tableName: Option[String],
    action: String,
    n: Long,
    nErrors: Long,
    ok: Boolean,
    error: Option[String])

/**
 * Live-catalog SINK: play an [[ImportPlan]]'s action frames against a
 * [[GlueCatalogClient]] — the executor-side analogue of the reference's
 * import Lambdas, with the same call shapes:
 *
 *  - databases: CreateDatabase for `create` rows only (skips never call —
 *    GDCUtil.processDatabseSchema:139-168 checks existence first; here the
 *    diff already did);
 *  - tables: create-or-update per row with cross-fallback (create hitting
 *    AlreadyExists retries as update, update hitting EntityNotFound retries
 *    as create) so at-least-once redelivery converges exactly like
 *    GlueUtil.createOrUpdateTable:264-350; `skipArchive` passes through to
 *    UpdateTable (GlueUtil.java:292-294);
 *  - partitions: rows co-located per (databaseName, tableName) and batched
 *    to the service limits — deletes 25/call before creates 100/call within
 *    each table (wholesale order: GDCUtil.java:76-99) — via consecutive-run
 *    chunking over each task's sorted iterator. No driver collect anywhere;
 *    a 1M-partition reconcile issues its batch calls from 1000 executors in
 *    parallel.
 *
 * All three appliers return LAZY status datasets; graft.catalog.
 * GlueReplication.replicateLive materializes them in topological order
 * (databases before tables before partitions), which is what replaces the
 * reference's create-then-retry-on-EntityNotFound control flow.
 */
object GlueSink {

  private implicit val statusEnc: Encoder[LiveApplyStatus] = Encoders.product[LiveApplyStatus]

  private def wrap(factory: GlueClientFactory, cfg: GlueSinkConfig): GlueCatalogClient =
    GlueCatalogClient.withRetry(factory.client(), cfg.maxErrorRetry, cfg.retryDelayMs)

  /** J1 live apply: CreateDatabase per `create` row; AlreadyExists (a
    * redelivered or raced create) counts as converged, other faults surface
    * on the status row (reference: catch-all → DBReplicationStatus.error,
    * GlueUtil.java:155-165). */
  def applyDatabases(dbActions: DataFrame, factory: GlueClientFactory, cfg: GlueSinkConfig): Dataset[LiveApplyStatus] = {
    val creates = Projection.toDatabaseInput(
      dbActions.where(col("action") === Action.Create).drop("action")).as[GDatabase]
    val skips = dbActions.where(col("action") === Action.Skip)
      .select(lit("database").as("entityKind"), col("name").as("databaseName"),
        lit(null).cast("string").as("tableName"), lit(Action.Skip).as("action"),
        lit(1L).as("n"), lit(0L).as("nErrors"), lit(true).as("ok"),
        lit(null).cast("string").as("error")).as[LiveApplyStatus]
    val applied = creates.mapPartitions { it =>
      val c = wrap(factory, cfg)
      it.map { db =>
        val err = try { c.createDatabase(db); None }
        catch {
          case _: GlueAlreadyExistsException => None // redelivery: already converged
          case e: Exception => Some(e.toString)
        }
        LiveApplyStatus("database", db.name, None, Action.Create, 1L, 0L, err.isEmpty, err)
      }
    }
    applied.unionByName(skips)
  }

  /** J2 live apply: P3 TableInput projection, then create-or-update with
    * cross-fallback. The diff's create/update label picks the FIRST call;
    * the fallback makes redelivery convergent. */
  def applyTables(tableActions: DataFrame, factory: GlueClientFactory, cfg: GlueSinkConfig): Dataset[LiveApplyStatus] = {
    val projected = Projection.toTableInput(
      tableActions.where(col("action").isin(Action.Create, Action.Update)))
    implicit val enc: Encoder[(GTable, String)] = Encoders.tuple(Codecs.tableEncoder, Encoders.STRING)
    val rows = projected
      .select(struct(Codecs.tableSchema.fieldNames.map(col).toSeq: _*).as("t"), col("action"))
      .as[(GTable, String)]
    rows.mapPartitions { it =>
      val c = wrap(factory, cfg)
      it.map { case (tbl, action) =>
        val err = try {
          if (action == Action.Create) {
            try c.createTable(tbl)
            catch { case _: GlueAlreadyExistsException => c.updateTable(tbl, cfg.skipArchive) }
          } else {
            try c.updateTable(tbl, cfg.skipArchive)
            catch { case _: GlueEntityNotFoundException => c.createTable(tbl) }
          }
          None
        } catch { case e: Exception => Some(e.toString) }
        LiveApplyStatus("table", tbl.databaseName, Some(tbl.name), action, 1L, 0L, err.isEmpty, err)
      }
    }
  }

  /** J3 live apply: batch calls at the service limits, deletes before creates
    * per table. Rows are hash-co-located on (databaseName, tableName) and
    * sorted so each task sees its tables' rows as consecutive runs —
    * chunking is then a pure iterator walk (ChunkedSink's grouped(n), plus
    * run-boundary detection), one status row per issued batch.
    *
    * At-least-once under Spark task retry: a task that dies mid-walk re-runs
    * its whole slice, and already-created partitions surface as
    * AlreadyExists entries on the retried batches' status rows — the same
    * per-partition error the reference logs on redelivered batches
    * (GlueUtil.java:421-428); catalog state still converges because create
    * is create-if-absent at partition granularity. */
  def applyPartitions(partActions: DataFrame, factory: GlueClientFactory, cfg: GlueSinkConfig): Dataset[LiveApplyStatus] = {
    implicit val enc: Encoder[(GPartition, String)] = Encoders.tuple(Codecs.partitionEncoder, Encoders.STRING)
    // Creates carry PartitionInput only (P4); deletes only need the key.
    val deletes = partActions.where(col("action") === Action.Delete)
    val creates = Projection.toPartitionInput(partActions.where(col("action") === Action.Create))
    // ONE exchange serves both needs: the (databaseName, tableName) hash
    // repartition co-locates each table's rows for batch chunking, and —
    // because those columns are a subset of the dedup key — it also satisfies
    // the duplicate-collapse aggregation's clustering, so the identity dedup
    // (same upsert-idempotency the fixture fold applies via
    // Applier.applyPartitions dropDuplicates; duplicate action rows must not
    // surface as AlreadyExists batch errors) adds NO second shuffle of the
    // million-row partition plane. Asserted by PlanAuditSpec. The dedup key
    // includes `action`: wholesale reconcile legitimately emits delete+create
    // for one identity, and both must survive (delete runs first).
    // Skew fan-out (cfg.partitionSalt): the salt is a pure function of the
    // identity key, so it joins the dedup key without changing semantics and
    // the (db, table, salt) clustering stays a subset of it — still ONE
    // exchange. Same-identity delete+create co-locate (same salt), so the
    // delete-first sort order holds inside every salted slice.
    val salt = math.max(cfg.partitionSalt, 1)
    val rows = deletes.unionByName(creates)
      .withColumn("_salt", if (salt == 1) lit(0) else pmod(hash(col("values")), lit(salt)))
      .repartition(col("databaseName"), col("tableName"), col("_salt"))
      .dropDuplicates("databaseName", "tableName", "values", "action", "_salt")
      .withColumn("_ord", when(col("action") === Action.Delete, 0).otherwise(1))
      .sortWithinPartitions(col("databaseName"), col("tableName"), col("_ord"))
      .select(struct(Codecs.partitionSchema.fieldNames.map(col).toSeq: _*).as("p"), col("action"))
      .as[(GPartition, String)]

    rows.mapPartitions { it =>
      val c = wrap(factory, cfg)
      val buf = it.buffered
      new Iterator[LiveApplyStatus] {
        def hasNext: Boolean = buf.hasNext
        def next(): LiveApplyStatus = {
          val (head, action) = buf.head
          val key = (head.databaseName, head.tableName, action)
          val limit =
            if (action == Action.Delete) GlueLimits.BatchDeletePartitions
            else GlueLimits.BatchCreatePartitions
          val chunk = Seq.newBuilder[GPartition]
          var size = 0
          while (buf.hasNext && size < limit && {
            val (p, a) = buf.head; (p.databaseName, p.tableName, a) == key
          }) { chunk += buf.next()._1; size += 1 }
          val batch = chunk.result()
          val (nErr, err) = try {
            val errs =
              if (action == Action.Delete)
                c.batchDeletePartitions(head.databaseName, head.tableName, batch.map(_.values))
              else c.batchCreatePartitions(head.databaseName, head.tableName, batch)
            // Convergent entries are not failures: AlreadyExists on a create
            // (redelivered batch / Spark task retry re-walking its slice) and
            // not-found on a delete both mean the catalog is ALREADY in the
            // desired state — same treatment applyDatabases/applyTables give
            // their point-call analogues. Only genuine faults remain errors.
            val converged =
              if (action == Action.Delete) "EntityNotFoundException" else "AlreadyExistsException"
            val real = errs.filterNot(_.errorCode == converged)
            (real.size.toLong, real.headOption.map(e => s"${e.errorCode}: ${e.message}"))
          } catch { case e: Exception => (batch.size.toLong, Some(e.toString)) }
          LiveApplyStatus("partition", head.databaseName, Some(head.tableName),
            action, batch.size.toLong, nErr, nErr == 0L, err)
        }
      }
    }
  }
}

final case class LiveReplicationResult(
    statuses: Dataset[LiveApplyStatus],
    deadLetters: Dataset[DeadLetter],
    messages: Dataset[CatalogMessage],
    actions: DataFrame,
    /** Export + import audit rows, same plane the fixture path produces
      * (DDBUtil.java:54-65,150-157) — "latest state per entity" windows work
      * identically over a live run. */
    audit: Dataset[AuditRecord])

/**
 * Live replication: export from a source snapshot, plan the import against
 * the CURRENT live target state, and play the plan through [[GlueSink]] in
 * topological order. One shared [[ReplicationJob.planImport]] produces the
 * decision for both fixture and live mode — the contract spec
 * (GlueConnectorSpec) proves a mock-backed live run lands the exact state the
 * fixture fold computes.
 */
object GlueReplication {

  def replicateLive(
      spark: SparkSession,
      src: CatalogSnapshot,
      factory: GlueClientFactory,
      cfg: ReplicationConfig,
      sinkCfg: GlueSinkConfig = GlueSinkConfig(),
      /** Parallel segments per target table's partition fetch (see
        * GlueCatalogSource.snapshot) — raise for targets with huge tables. */
      partitionSegments: Int = 1): LiveReplicationResult =
    applyMessagesLive(spark, ReplicationJob.export(spark, src, cfg), factory, cfg, sinkCfg,
      partitionSegments)

  /** Import-side half of the live path: plan a message plane against the
    * CURRENT service state and play it through the sink. Consumed by
    * [[replicateLive]] (batch) and MessageStream.runLiveImport (per
    * micro-batch — the closest analogue to the reference's SQS→Lambda→Glue
    * event loop, where the catalog itself is the only cross-batch state). */
  def applyMessagesLive(
      spark: SparkSession,
      messages: Dataset[CatalogMessage],
      factory: GlueClientFactory,
      cfg: ReplicationConfig,
      sinkCfg: GlueSinkConfig = GlueSinkConfig(),
      partitionSegments: Int = 1,
      /** Fetch only the target state the messages NAME (point gets) instead
        * of crawling the whole catalog. Right for bounded message sets —
        * runLiveImport turns it on so each micro-batch costs O(batch) service
        * calls; bulk replicateLive keeps the full snapshot, whose one crawl
        * amortizes over the whole run. */
      pruneFetchToMessages: Boolean = false,
      /** Hard bound on the pruned fetch's driver materialization: when the
        * batch names more than this many DISTINCT identities, the point-get
        * plan would put that many tuples on the driver (a 1M-table backlog
        * drained as ONE AvailableNow batch), and at that scale the full
        * crawl is the cheaper, constant-driver-memory plan anyway — fall
        * back to it. Checked with a pair of count aggregates over the
        * pinned batch BEFORE any collect, so the cap engages without ever
        * materializing the keys it refuses. */
      pruneFetchMaxKeys: Int = 100000): LiveReplicationResult = {
    val pinned = messages.localCheckpoint(true)
    def overKeyCap(keyed: org.apache.spark.sql.DataFrame): Boolean = {
      val nDb = keyed.select(col("dbName").as("n")).where(col("n").isNotNull)
        .unionByName(keyed.select(col("tDb").as("n")).where(col("n").isNotNull))
        .distinct().count()
      val nTab = keyed.select(col("tDb"), col("tName"))
        .where(col("tDb").isNotNull && col("tName").isNotNull)
        .distinct().count()
      nDb + nTab > pruneFetchMaxKeys
    }
    // Identities named by this message set, aggregated to DISTINCT keys
    // executor-side BEFORE the collect — the driver holds one row per
    // distinct entity, never one per message (an AvailableNow drain can
    // deliver the entire backlog as one batch, and redelivered floods
    // repeat the same identities thousands of times). Table messages' db
    // names are included so implicit-db existence checks see them.
    lazy val keyed = pinned.select(
      get_json_object(col("payload"), "$.name").as("dbName"),
      get_json_object(col("payload"), "$.table.databaseName").as("tDb"),
      get_json_object(col("payload"), "$.table.name").as("tName"))
    val tgt =
      if (!pruneFetchToMessages || overKeyCap(keyed))
        GlueCatalogSource.snapshot(spark, factory, sinkCfg, partitionSegments)
      else {
        val dbNames = keyed.select(col("dbName").as("n")).where(col("n").isNotNull)
          .unionByName(keyed.select(col("tDb").as("n")).where(col("n").isNotNull))
          .distinct().collect().map(_.getString(0))
        val tableKeys = keyed.select(col("tDb"), col("tName"))
          .where(col("tDb").isNotNull && col("tName").isNotNull)
          .distinct().collect().map(r => (r.getString(0), r.getString(1)))
        GlueCatalogSource.snapshotForKeys(spark, factory, sinkCfg,
          dbNames.toSeq, tableKeys.toSeq, partitionSegments)
      }
    // planImport pins the message plane (lineage-free localCheckpoint): the
    // three apply jobs, audit, and dead letters all read the SAME
    // materialized export instead of replaying the source scans.
    val plan = ReplicationJob.planImport(spark, pinned, tgt, cfg)
    // Materialize each plane's statuses before starting the next: databases
    // must exist before CreateTable, tables before BatchCreatePartition.
    // localCheckpoint(eager) both runs the side effects and pins the (small,
    // one-row-per-entity-or-batch) status planes.
    val sDb = GlueSink.applyDatabases(plan.dbActions, factory, sinkCfg).localCheckpoint(true)
    val sTbl = GlueSink.applyTables(plan.tableActions, factory, sinkCfg).localCheckpoint(true)
    val sPart = GlueSink.applyPartitions(plan.partActions, factory, sinkCfg).localCheckpoint(true)
    val statuses = sDb.unionByName(sTbl).unionByName(sPart)
    val audit = graft.operators.Exporter.exportAudit(plan.messages, cfg.runId)
      .unionByName(ReplicationJob.importAudit(plan.actions, cfg, tgt.catalogId))
      .as[AuditRecord](Codecs.auditEncoder)
    LiveReplicationResult(statuses,
      plan.deadLetters.unionByName(sinkDeadLetters(plan.messages, statuses)),
      plan.messages, plan.actions, audit)
  }

  /** Map failed apply statuses back to their originating MESSAGES — the
    * reference's DLQ granularity (a Lambda rethrows its whole message on any
    * Glue API failure, GDCUtil.java:112-116) — so ReDriveJob/re-running
    * applyMessagesLive over these dead letters retries exactly what failed.
    * A failed database status selects its database message; failed table or
    * partition statuses select the table/largeTable message that carried
    * that (databaseName, tableName). */
  def sinkDeadLetters(
      messages: Dataset[CatalogMessage],
      statuses: Dataset[LiveApplyStatus]): Dataset[DeadLetter] = {
    val failed = statuses.where(!col("ok"))
    val failedDbs = failed.where(col("entityKind") === "database")
      .select(col("databaseName").as("_id"), col("error").as("_err"))
      .dropDuplicates("_id")
    val failedTables = failed.where(col("entityKind") =!= "database")
      .select(col("databaseName").as("_db"), col("tableName").as("_tbl"), col("error").as("_err"))
      .dropDuplicates("_db", "_tbl")
    val m = messages.withColumn("_dbId",
        when(col("messageType") === MessageType.Database,
          get_json_object(col("payload"), "$.name")))
      .withColumn("_tblDb", get_json_object(col("payload"), "$.table.databaseName"))
      .withColumn("_tblName", get_json_object(col("payload"), "$.table.name"))
    val deadDbMsgs = m.join(broadcast(failedDbs), m("_dbId") === failedDbs("_id"))
    val deadTblMsgs = m.join(broadcast(failedTables),
      m("_tblDb") === failedTables("_db") && m("_tblName") === failedTables("_tbl"))
    deadDbMsgs.unionByName(deadTblMsgs, allowMissingColumns = true)
      .select(col("messageType"), col("payload"), col("exportBatchId"),
        col("sourceCatalogId"), coalesce(col("_err"), lit("apply failure")).as("error"),
        col("s3BucketName"), col("s3ObjectKey"))
      .dropDuplicates("messageType", "payload")
      .as[DeadLetter]
  }
}
