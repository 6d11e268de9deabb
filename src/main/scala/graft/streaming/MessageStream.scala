package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.codec.Codecs._
import graft.model._
import graft.run.{ReplicationConfig, ReplicationJob}
import graft.sources.CatalogSnapshot

/**
 * S7/S8 — the event-driven message plane as Structured Streaming.
 *
 * The reference's import side is SNS→SQS→Lambda micro-batches at batch size 1
 * (README.md:120,208; template.yaml:124 visibility-timeout redelivery;
 * ImportDatabaseOrTable.java:43-73). The Spark-native shape is a file-drop
 * streaming source over the exported-message dataset:
 *
 *  - **source**: `readStream.json` on a message directory (the SQS queue
 *    analogue — exporters append files, the stream discovers them), or the
 *    REAL DataSourceV2 `MicroBatchStream` connector ([[MessageQueueSource]],
 *    `readMessagesQueue` / `queueMaxMessagesPerTrigger`) with explicit
 *    sequence offsets, per-message admission control and a commit/ack hook;
 *  - **trigger**: `Trigger.AvailableNow` drains the current backlog then
 *    stops — the reference's cron-kicked daily run; a `ProcessingTime`
 *    trigger gives the long-lived tail-the-queue mode;
 *  - **sink**: `foreachBatch` folds each micro-batch through the SAME
 *    batch-mode `ReplicationJob.importMessages` (one code path, two drivers);
 *  - **state**: INCREMENTAL — each batch writes only its action DELTAS
 *    under `stateDir/d<batchId>` (O(batch) parquet, the reference's
 *    per-event incremental writes, ImportDatabaseOrTable.java:43-73), and
 *    every `compactEvery`-th batch folds the chain into a full snapshot
 *    `stateDir/v<batchId>` so reads fold a bounded delta suffix — draining a
 *    1M-partition catalog in 100 batches no longer rewrites the partition
 *    plane 100×. Batch N reads the newest full version `< N` plus the deltas
 *    after it, clears any `≥ N` leftovers (torn writes of a previous
 *    attempt/incarnation), and (over)writes its own output from the same
 *    input: exactly-once state from an at-least-once source, the
 *    checkpoint's stable batch ids standing in for the reference's
 *    idempotent-upsert-under-redelivery;
 *  - **DLQ**: each batch's dead letters append under `stateDir/dead` for
 *    ReDriveJob.
 *
 * At scale the per-batch work is the same joins the batch job runs — the
 * micro-batch is just smaller; nothing here collects to the driver.
 */
object MessageStream {

  /** The message plane as an unbounded stream (S7/S8 source). */
  def readMessages(spark: SparkSession, messagesDir: String,
      maxFilesPerTrigger: Option[Int] = None): Dataset[CatalogMessage] = {
    val r = spark.readStream.schema(messageEncoder.schema)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.json(messagesDir).as[CatalogMessage]
  }

  /** The message plane through the REAL DataSourceV2 MicroBatchStream
    * connector ([[MessageQueueSource]]) — explicit sequence offsets, an
    * offset-stability file log under the checkpoint, per-MESSAGE admission
    * control (`maxOffsetsPerTrigger`, the reference's SQS batch-size knob,
    * template.yaml:275), and the commit/ack queue-deletion hook. Same rows
    * as [[readMessages]] over the same directory (MessageQueueSourceSpec
    * pins the equivalence); corrupt lines surface with null `messageType`
    * and the raw bytes in `payload` for P6 DLQ routing. */
  def readMessagesQueue(spark: SparkSession, messagesDir: String,
      maxMessagesPerTrigger: Option[Long] = None): Dataset[CatalogMessage] = {
    val r = spark.readStream.format("graft-queue").option("path", messagesDir)
    maxMessagesPerTrigger.foreach(n => r.option("maxOffsetsPerTrigger", n.toString))
    r.load().as[CatalogMessage]
  }

  /** At-least-once redelivery dedup: SQS visibility-timeout redelivery
    * (template.yaml:124) re-enqueues the SAME message; collapsing copies
    * avoids re-running the apply work (the apply itself stays idempotent
    * either way — upsert semantics — exactly as the reference converges
    * under redelivery). The streaming state keys on `sha2(payload)` rather
    * than the payload itself: a large-table stub payload is KBs, and
    * dropDuplicates state rows store the key columns — digesting keeps every
    * state row constant-size (a few dozen bytes) while identical bytes still
    * collapse and distinct payloads still both pass. State holds one key per
    * distinct message for the drain (bounded by the run's message count);
    * for a non-draining tail-the-queue deployment use
    * [[dedupMessagesWithinWatermark]] so state also ages OUT. */
  def dedupMessages(stream: Dataset[CatalogMessage]): Dataset[CatalogMessage] =
    stream
      .withColumn("_payloadDigest", sha2(col("payload"), 256))
      .dropDuplicates("messageType", "sourceCatalogId", "exportBatchId", "_payloadDigest")
      .drop("_payloadDigest").as[CatalogMessage]

  /** Redelivery dedup for LONG-LIVED streams: same digest key, but state ages
    * out once the watermark passes a message's ingest time + `delay` — total
    * state is bounded by the redelivery horizon (SQS redelivers within the
    * visibility timeout, template.yaml:124: 195 s, so any `delay` comfortably
    * above it collapses every real redelivery), not by stream lifetime.
    * `ingestTs` defaults to arrival wall-clock; tests inject a deterministic
    * column. A duplicate arriving after its key aged out re-emits — that is
    * the documented at-least-once contract, and the downstream apply is
    * idempotent precisely so late redelivery is safe. */
  def dedupMessagesWithinWatermark(
      stream: Dataset[CatalogMessage],
      delay: String = "10 minutes",
      ingestTs: org.apache.spark.sql.Column = current_timestamp()): Dataset[CatalogMessage] =
    stream
      .withColumn("_ingestTs", ingestTs)
      .withColumn("_payloadDigest", sha2(col("payload"), 256))
      .withWatermark("_ingestTs", delay)
      .dropDuplicatesWithinWatermark("messageType", "sourceCatalogId", "exportBatchId", "_payloadDigest")
      .drop("_ingestTs", "_payloadDigest").as[CatalogMessage]

  private def stateSubdirs(spark: SparkSession, stateDir: String,
      prefix: String): Seq[(Long, String)] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(stateDir), spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(stateDir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      .flatMap(s => scala.util.Try(s.getPath.getName.drop(prefix.length).toLong).toOption
        .map(_ -> s.getPath.toString))
  }

  private def versionDirs(spark: SparkSession, stateDir: String): Seq[(Long, String)] =
    stateSubdirs(spark, stateDir, "v")

  private def deltaDirs(spark: SparkSession, stateDir: String): Seq[(Long, String)] =
    stateSubdirs(spark, stateDir, "d")

  /** Delete full/delta state dirs with id ≥ batchId — torn writes of a
    * previous attempt of this batch, or leftovers of a previous incarnation
    * whose checkpoint was lost (stale higher-numbered deltas would otherwise
    * fold on top of this incarnation's state). Deterministic on replay. */
  private def clearFrom(spark: SparkSession, stateDir: String, batchId: Long): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(stateDir), spark.sparkContext.hadoopConfiguration)
    (versionDirs(spark, stateDir) ++ deltaDirs(spark, stateDir))
      .filter(_._1 >= batchId)
      .foreach { case (_, d) => fs.delete(new org.apache.hadoop.fs.Path(d), true) }
  }

  private def readState(spark: SparkSession, dir: String, catalogId: String): CatalogSnapshot =
    CatalogSnapshot(catalogId,
      spark.read.schema(databaseSchema).parquet(s"$dir/databases").as[GDatabase],
      spark.read.schema(tableSchema).parquet(s"$dir/tables").as[GTable],
      spark.read.schema(partitionSchema).parquet(s"$dir/partitions").as[GPartition])

  private def writeState(snap: CatalogSnapshot, dir: String): Unit = {
    snap.databases.write.mode("overwrite").parquet(s"$dir/databases")
    snap.tables.write.mode("overwrite").parquet(s"$dir/tables")
    snap.partitions.write.mode("overwrite").parquet(s"$dir/partitions")
  }

  /** Write a batch's non-skip action planes — the O(batch) state delta. */
  private def writeDelta(plan: graft.run.ImportPlan, dir: String): Unit = {
    plan.dbActions.where(col("action") =!= Action.Skip)
      .write.mode("overwrite").parquet(s"$dir/databases")
    plan.tableActions.where(col("action") =!= Action.Skip)
      .write.mode("overwrite").parquet(s"$dir/tables")
    plan.partActions.where(col("action") =!= Action.Skip)
      .write.mode("overwrite").parquet(s"$dir/partitions")
  }

  /** Fold one on-disk delta into a snapshot through the SAME Applier the
    * batch import uses — replaying deltas is bit-for-bit the import fold. */
  private def applyDelta(spark: SparkSession, snap: CatalogSnapshot, dir: String): CatalogSnapshot = {
    import graft.operators.Applier
    val dbA = spark.read.schema(databaseSchema.add("action", "string")).parquet(s"$dir/databases")
    val tblA = spark.read.schema(tableSchema.add("action", "string")).parquet(s"$dir/tables")
    val partA = spark.read.schema(partitionSchema.add("action", "string")).parquet(s"$dir/partitions")
    CatalogSnapshot(snap.catalogId,
      Applier.applyDatabases(snap.databases, dbA),
      Applier.applyTables(snap.tables, tblA),
      Applier.applyPartitions(snap.partitions, partA))
  }

  /** Committed state strictly below `batchId`: the newest full snapshot
    * `< batchId` (or `initial`), plus the delta chain after it folded through
    * the Applier — bounded by the compaction cadence, never the full history. */
  def stateBefore(spark: SparkSession, stateDir: String, batchId: Long,
      initial: CatalogSnapshot): CatalogSnapshot = {
    val base = versionDirs(spark, stateDir).filter(_._1 < batchId).sortBy(_._1).lastOption
    val baseSnap = base match {
      case Some((_, dir)) => readState(spark, dir, initial.catalogId)
      case None => initial
    }
    val from = base.map(_._1).getOrElse(-1L)
    deltaDirs(spark, stateDir)
      .filter { case (id, _) => id > from && id < batchId }
      .sortBy(_._1)
      .foldLeft(baseSnap) { case (snap, (_, dir)) => applyDelta(spark, snap, dir) }
  }

  /** Latest committed state (read after the stream drains). */
  def latestState(spark: SparkSession, stateDir: String, initial: CatalogSnapshot): CatalogSnapshot =
    stateBefore(spark, stateDir, Long.MaxValue, initial)

  /** Maintenance: delete state dirs SUPERSEDED by the newest full snapshot —
    * everything strictly older than the newest `v<id>` (older fulls and the
    * delta chains they already folded in). The newest full plus its trailing
    * deltas reconstruct the same `latestState`, so the visible state is
    * unchanged; long-lived ProcessingTime deployments call this between
    * drains (the VACUUM model — in-line deletion inside foreachBatch would
    * race batch replay: a crash after deleting history but before the new
    * full commits would strand the replay with nothing to rebuild from).
    * Returns the number of dirs removed. */
  def pruneState(spark: SparkSession, stateDir: String): Int = {
    val fulls = versionDirs(spark, stateDir)
    if (fulls.isEmpty) return 0
    val newest = fulls.map(_._1).max
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(stateDir), spark.sparkContext.hadoopConfiguration)
    val doomed = (fulls ++ deltaDirs(spark, stateDir)).filter(_._1 < newest)
    doomed.foreach { case (_, d) => fs.delete(new org.apache.hadoop.fs.Path(d), true) }
    doomed.size
  }

  /**
   * Streaming import: drain `messagesDir` into versioned target state under
   * `stateDir`, checkpointing source progress in `checkpointDir`. Returns the
   * final target snapshot. `availableNow = false` would tail forever; the
   * bounded drain is what Verify/specs and the reference's daily cron need.
   */
  def runImport(
      spark: SparkSession,
      messagesDir: String,
      stateDir: String,
      checkpointDir: String,
      initial: CatalogSnapshot,
      cfg: ReplicationConfig,
      maxFilesPerTrigger: Option[Int] = None,
      /** Collapse redelivered copies before the per-batch import (digest-keyed
        * stateful dedup). Off by default: the apply is idempotent either way,
        * dedup just avoids re-running apply work for duplicate deliveries. */
      dedupRedelivered: Boolean = false,
      /** Full-snapshot cadence: batch ids ≡ 0 (mod compactEvery) fold the
        * delta chain into `v<batchId>`; every other batch writes only its
        * O(batch) delta. Deterministic in batchId, so a replayed batch makes
        * the same full-vs-delta choice. Batch 0 always compacts — the chain
        * has a materialized base even when `initial` is an expensive frame. */
      compactEvery: Int = 8,
      queueMaxMessagesPerTrigger: Option[Long] = None): CatalogSnapshot = {
    val q = startImport(spark, messagesDir, stateDir, checkpointDir, initial, cfg,
      maxFilesPerTrigger, dedupRedelivered, None, compactEvery, Trigger.AvailableNow(),
      queueMaxMessagesPerTrigger)
    q.awaitTermination()
    latestState(spark, stateDir, initial)
  }

  /**
   * Long-lived form of [[runImport]]: start the import stream under any
   * trigger and return the live query. `Trigger.ProcessingTime` is the
   * tail-the-queue deployment — the reference's always-armed SQS→Lambda
   * wiring (template.yaml:275) — where the stream keeps draining newly
   * dropped message files until the caller stops it; pair it with
   * `dedupWatermark` so redelivery-dedup state ages OUT (bounded by the
   * horizon, not stream lifetime). The caller reads converged state with
   * [[latestState]] after (or between) batches.
   */
  def startImport(
      spark: SparkSession,
      messagesDir: String,
      stateDir: String,
      checkpointDir: String,
      initial: CatalogSnapshot,
      cfg: ReplicationConfig,
      maxFilesPerTrigger: Option[Int] = None,
      dedupRedelivered: Boolean = false,
      /** When set, redelivered copies collapse via the WATERMARKED digest
        * dedup with this delay (e.g. "10 minutes") — the long-lived variant
        * whose state is bounded by the redelivery horizon. Overrides
        * `dedupRedelivered`. */
      dedupWatermark: Option[String] = None,
      compactEvery: Int = 8,
      trigger: Trigger = Trigger.AvailableNow(),
      /** When set, read through the DSv2 [[MessageQueueSource]] connector
        * with this per-MESSAGE admission cap instead of the file-drop json
        * source (Some(Long.MaxValue) for the connector with no cap). */
      queueMaxMessagesPerTrigger: Option[Long] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    require(compactEvery >= 1, s"compactEvery must be >= 1, got $compactEvery")

    val source = queueMaxMessagesPerTrigger match {
      case Some(cap) => readMessagesQueue(spark, messagesDir,
        Some(cap).filter(_ != Long.MaxValue))
      case None => readMessages(spark, messagesDir, maxFilesPerTrigger)
    }
    val deduped = dedupWatermark match {
      case Some(delay) => dedupMessagesWithinWatermark(source, delay)
      case None if dedupRedelivered => dedupMessages(source)
      case None => source
    }
    deduped
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[CatalogMessage], batchId: Long) =>
        clearFrom(spark, stateDir, batchId)
        val tgt = stateBefore(spark, stateDir, batchId, initial)
        // Micro-batch runs carry the batch id in the run id, mirroring the
        // reference's per-invocation export_run_id stamps.
        val plan = ReplicationJob.planImport(spark, batch, tgt,
          cfg.copy(runId = cfg.runId + batchId))
        if (batchId % compactEvery == 0) {
          import graft.operators.Applier
          writeState(CatalogSnapshot(tgt.catalogId,
            Applier.applyDatabases(tgt.databases, plan.dbActions),
            Applier.applyTables(tgt.tables, plan.tableActions),
            Applier.applyPartitions(tgt.partitions, plan.partActions)),
            s"$stateDir/v$batchId")
        } else writeDelta(plan, s"$stateDir/d$batchId")
        plan.deadLetters.write.mode("append").parquet(s"$stateDir/dead")
        ()
      }
      .start()
  }

  /**
   * Streaming LIVE import: drain `messagesDir` straight into a catalog
   * service through the GlueSink — the closest Spark analogue of the
   * reference's event-driven deployment (SQS → Lambda → Glue API calls,
   * ImportDatabaseOrTable.java:43-73): each micro-batch re-reads the live
   * target state, diffs, and applies. The CATALOG is the only cross-batch
   * state (the reference's model exactly); the checkpoint tracks source
   * progress, and batch replay after a crash is safe because every apply is
   * convergent (create-if-absent / create-or-update / batch upsert).
   *
   * Statuses append under `statusDir` per batch (one row per entity/batch —
   * the reference's DynamoDB status-table analogue, DDBUtil.java:54-65) and
   * come back as a LAZY dataset read from there: draining a 1M-partition
   * backlog never holds the status history in driver memory.
   */
  def runLiveImport(
      spark: SparkSession,
      messagesDir: String,
      factory: graft.catalog.GlueClientFactory,
      checkpointDir: String,
      /** DLQ location: every batch's dead letters (malformed payloads,
        * unknown types, failed applies) append here — the checkpoint
        * advances past their files, so without this record they'd be lost.
        * Read back with [[deadLetters]]; re-drive with ReDriveJob.messagesOf
        * → GlueReplication.applyMessagesLive. */
      deadLetterDir: String,
      /** Status-plane location: per-batch apply statuses append here. */
      statusDir: String,
      cfg: ReplicationConfig,
      sinkCfg: graft.catalog.GlueSinkConfig = graft.catalog.GlueSinkConfig(),
      /** Defaults to 64 — without a cap, AvailableNow delivers the ENTIRE
        * backlog as one micro-batch, and the pruned fetch + statuses would
        * scale with the whole queue instead of a bounded batch. None only for
        * callers that bound the backlog themselves. */
      maxFilesPerTrigger: Option[Int] = Some(64),
      dedupRedelivered: Boolean = false): Dataset[graft.catalog.LiveApplyStatus] = {
    val q = startLiveImport(spark, messagesDir, factory, checkpointDir, deadLetterDir,
      statusDir, cfg, sinkCfg, maxFilesPerTrigger, dedupRedelivered)
    q.awaitTermination()
    statusesAt(spark, statusDir)
  }

  /**
   * Long-lived form of [[runLiveImport]]: start the live-apply stream under
   * any trigger and return the live query. `Trigger.ProcessingTime` is the
   * tail-the-queue deployment — the reference's always-armed SQS→Lambda→Glue
   * wiring (template.yaml:275), where newly dropped message files keep
   * draining into the catalog service until the caller stops the query. The
   * catalog itself remains the only cross-batch state: a tailing stream that
   * is stopped and later restarted (same checkpoint) resumes exactly where
   * the file-source log left off, and convergent applies make replay of an
   * uncommitted batch safe. Pair with `dedupRedelivered` for burst
   * redelivery; read progress from [[statusesAt]] between batches.
   */
  def startLiveImport(
      spark: SparkSession,
      messagesDir: String,
      factory: graft.catalog.GlueClientFactory,
      checkpointDir: String,
      deadLetterDir: String,
      statusDir: String,
      cfg: ReplicationConfig,
      sinkCfg: graft.catalog.GlueSinkConfig = graft.catalog.GlueSinkConfig(),
      maxFilesPerTrigger: Option[Int] = Some(64),
      dedupRedelivered: Boolean = false,
      trigger: Trigger = Trigger.AvailableNow()): org.apache.spark.sql.streaming.StreamingQuery = {
    val source = readMessages(spark, messagesDir, maxFilesPerTrigger)
    (if (dedupRedelivered) dedupMessages(source) else source)
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[CatalogMessage], batchId: Long) =>
        val res = graft.catalog.GlueReplication.applyMessagesLive(
          spark, batch, factory, cfg.copy(runId = cfg.runId + batchId), sinkCfg,
          pruneFetchToMessages = true)
        res.deadLetters.write.mode("append").parquet(deadLetterDir)
        res.statuses.withColumn("batchId", lit(batchId))
          .write.mode("append").parquet(statusDir)
        ()
      }
      .start()
  }

  /** Statuses accumulated by runLiveImport (lazy; empty if no batch ran). */
  def statusesAt(spark: SparkSession, statusDir: String): Dataset[graft.catalog.LiveApplyStatus] = {
    import spark.implicits._
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(statusDir), spark.sparkContext.hadoopConfiguration)
    val enc = org.apache.spark.sql.Encoders.product[graft.catalog.LiveApplyStatus]
    if (fs.exists(new org.apache.hadoop.fs.Path(statusDir)))
      spark.read.schema(enc.schema.add("batchId", "long")).parquet(statusDir)
        .drop("batchId").as[graft.catalog.LiveApplyStatus](enc)
    else spark.emptyDataset[graft.catalog.LiveApplyStatus](enc)
  }

  /** Dead letters accumulated by runImport (for ReDriveJob). */
  def deadLetters(spark: SparkSession, stateDir: String): Dataset[DeadLetter] =
    deadLettersAt(spark, s"$stateDir/dead")

  /** Dead letters at an explicit DLQ dir (runLiveImport's deadLetterDir). */
  def deadLettersAt(spark: SparkSession, dir: String): Dataset[DeadLetter] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(dir)
    if (fs.exists(p)) spark.read.schema(deadLetterEncoder.schema).parquet(dir).as[DeadLetter]
    else spark.emptyDataset[DeadLetter]
  }
}
