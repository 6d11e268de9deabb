package graft

import org.apache.spark.sql.functions._

import graft.codec.Codecs._
import graft.model._
import graft.run.{ReplicationConfig, ReplicationJob}
import graft.sources.CatalogSnapshot
import graft.streaming.MessageStream

/**
 * S7/S8 streaming-import specs (SURVEY §2.7): AvailableNow drain equals the
 * batch import, checkpointing resumes incrementally, and redelivery after a
 * lost checkpoint converges (at-least-once safety).
 */
class StreamingImportSpec extends SparkSpec {
  import spark.implicits._

  private def snapshot(names: Seq[String]): CatalogSnapshot = {
    val dbs = Seq(GDatabase("db0"))
    val tables = names.map(n => GTable(name = n, databaseName = "db0"))
    val parts = names.flatMap(n => Seq(GPartition(Seq("p0"), "db0", n), GPartition(Seq("p1"), "db0", n)))
    CatalogSnapshot("src", spark.createDataset(dbs), spark.createDataset(tables),
      spark.createDataset(parts))
  }

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def tableNames(s: CatalogSnapshot): Set[String] =
    s.tables.select("name").as[String].collect().toSet

  test("AvailableNow streaming drain equals the batch import") {
    val src = snapshot(Seq("t0", "t1", "t2"))
    val cfg = ReplicationConfig(runId = 100L, sideChannelDir = Some(tmp("side")))
    val messages = ReplicationJob.export(spark, src, cfg)

    val msgDir = tmp("msgs")
    messages.repartition(3).write.mode("overwrite").json(msgDir)

    val streamed = MessageStream.runImport(spark, msgDir, tmp("state"), tmp("ckpt"),
      CatalogSnapshot.empty(spark, "tgt"), cfg, maxFilesPerTrigger = Some(1))
    val batch = ReplicationJob.importMessages(spark, messages,
      CatalogSnapshot.empty(spark, "tgt"), cfg).target

    assert(tableNames(streamed) == tableNames(batch))
    assert(streamed.partitions.count() == batch.partitions.count())
    assert(streamed.databases.select("name").as[String].collect().toSet == Set("db0"))
  }

  test("checkpoint resume: a second drain processes only newly dropped files") {
    val cfg = ReplicationConfig(runId = 200L, sideChannelDir = Some(tmp("side")))
    val msgDir = tmp("msgs")
    val stateDir = tmp("state")
    val ckptDir = tmp("ckpt")

    ReplicationJob.export(spark, snapshot(Seq("a0")), cfg)
      .write.mode("append").json(msgDir)
    val s1 = MessageStream.runImport(spark, msgDir, stateDir, ckptDir,
      CatalogSnapshot.empty(spark, "tgt"), cfg)
    assert(tableNames(s1) == Set("a0"))

    ReplicationJob.export(spark, snapshot(Seq("b0")), cfg.copy(runId = 201L))
      .write.mode("append").json(msgDir)
    val s2 = MessageStream.runImport(spark, msgDir, stateDir, ckptDir,
      CatalogSnapshot.empty(spark, "tgt"), cfg)
    assert(tableNames(s2) == Set("a0", "b0"))
  }

  test("redelivery after checkpoint loss converges (at-least-once, idempotent upsert)") {
    val src = snapshot(Seq("r0", "r1"))
    val cfg = ReplicationConfig(runId = 300L, sideChannelDir = Some(tmp("side")))
    val msgDir = tmp("msgs")
    val stateDir = tmp("state")
    ReplicationJob.export(spark, src, cfg).write.mode("overwrite").json(msgDir)

    val s1 = MessageStream.runImport(spark, msgDir, stateDir, tmp("ckpt1"),
      CatalogSnapshot.empty(spark, "tgt"), cfg)
    // materialize before redelivery overwrites the state version files
    assert(tableNames(s1) == Set("r0", "r1"))
    val s1Parts = s1.partitions.count()

    // lost checkpoint → everything redelivered into the SAME state dir
    val s2 = MessageStream.runImport(spark, msgDir, stateDir, tmp("ckpt2"),
      CatalogSnapshot.empty(spark, "tgt"), cfg)
    assert(tableNames(s2) == Set("r0", "r1"))
    assert(s2.partitions.count() == s1Parts)
  }

  test("incremental state: a batch touching one table writes an O(batch) delta, not the full planes") {
    val cfg = ReplicationConfig(runId = 700L, sideChannelDir = Some(tmp("side")))
    val msgDir = tmp("msgs")
    val stateDir = tmp("state")
    val ckptDir = tmp("ckpt")

    // batch 0: three tables (compacts to v0 — the full base)
    ReplicationJob.export(spark, snapshot(Seq("c0", "c1", "c2")), cfg)
      .write.mode("append").json(msgDir)
    val s1 = MessageStream.runImport(spark, msgDir, stateDir, ckptDir,
      CatalogSnapshot.empty(spark, "tgt"), cfg)
    assert(tableNames(s1) == Set("c0", "c1", "c2"))

    // batch 1: ONE new table → must land as delta d1, no full rewrite
    ReplicationJob.export(spark, snapshot(Seq("c3")), cfg.copy(runId = 701L))
      .write.mode("append").json(msgDir)
    val s2 = MessageStream.runImport(spark, msgDir, stateDir, ckptDir,
      CatalogSnapshot.empty(spark, "tgt"), cfg)
    assert(tableNames(s2) == Set("c0", "c1", "c2", "c3"))
    assert(s2.partitions.count() == 8)

    val state = new java.io.File(stateDir).listFiles().map(_.getName).toSet
    assert(state.contains("v0") && state.contains("d1") && !state.contains("v1"),
      s"expected full v0 + delta d1, got $state")
    // the delta carries only batch 1's rows — the partition plane was NOT
    // rewritten (4 tables × 2 partitions on disk would be 8)
    val d1Parts = spark.read.schema(partitionSchema.add("action", "string"))
      .parquet(s"$stateDir/d1/partitions")
    assert(d1Parts.count() == 2, "delta must hold only the touched table's partitions")
    assert(d1Parts.select("tableName").as[String].collect().toSet == Set("c3"))

    // and the folded state equals a one-shot batch import of everything
    val all = spark.read.schema(messageEncoder.schema).json(msgDir).as[CatalogMessage]
    val batch = ReplicationJob.importMessages(spark, all,
      CatalogSnapshot.empty(spark, "tgt"), cfg).target
    assert(tableNames(s2) == tableNames(batch))
    assert(s2.partitions.count() == batch.partitions.count())
  }

  test("incremental state: delta chain + compaction converge across many batches") {
    val cfg = ReplicationConfig(runId = 800L, sideChannelDir = Some(tmp("side")))
    val msgDir = tmp("msgs")
    // five separate files → five micro-batches at maxFilesPerTrigger=1;
    // compactEvery=3 exercises base → delta → delta → compact → delta
    (0 until 5).foreach { i =>
      ReplicationJob.export(spark, snapshot(Seq(s"m$i")), cfg.copy(runId = 800L + i))
        .coalesce(1).write.mode("append").json(msgDir)
    }
    val stateDir = tmp("state")
    val s = MessageStream.runImport(spark, msgDir, stateDir, tmp("ckpt"),
      CatalogSnapshot.empty(spark, "tgt"), cfg, maxFilesPerTrigger = Some(1),
      compactEvery = 3)
    assert(tableNames(s) == (0 until 5).map(i => s"m$i").toSet)
    assert(s.partitions.count() == 10)
    val state = new java.io.File(stateDir).listFiles().map(_.getName).toSet
    assert(state.contains("v0") && state.contains("v3"), s"missing compactions in $state")
    assert(state.contains("d1") && state.contains("d2") && state.contains("d4"), s"missing deltas in $state")
  }

  test("pruneState drops superseded history and leaves latestState unchanged") {
    val cfg = ReplicationConfig(runId = 1100L, sideChannelDir = Some(tmp("side")))
    val msgDir = tmp("msgs")
    (0 until 5).foreach { i =>
      ReplicationJob.export(spark, snapshot(Seq(s"k$i")), cfg.copy(runId = 1100L + i))
        .coalesce(1).write.mode("append").json(msgDir)
    }
    val stateDir = tmp("state")
    val drained = MessageStream.runImport(spark, msgDir, stateDir, tmp("ckpt"),
      CatalogSnapshot.empty(spark, "tgt"), cfg, maxFilesPerTrigger = Some(1),
      compactEvery = 3) // dirs: v0, d1, d2, v3, d4
    val before = tableNames(drained)
    val pruned = MessageStream.pruneState(spark, stateDir)
    assert(pruned == 3, "v0, d1, d2 are superseded by v3")
    val state = new java.io.File(stateDir).listFiles().map(_.getName).toSet
    assert(state.contains("v3") && state.contains("d4"))
    assert(!state.contains("v0") && !state.contains("d1") && !state.contains("d2"))
    val after = MessageStream.latestState(spark, stateDir, CatalogSnapshot.empty(spark, "tgt"))
    assert(tableNames(after) == before)
    assert(after.partitions.count() == 10)
  }

  test("incremental state: stale higher-numbered leftovers of a lost incarnation are cleared, not folded") {
    // A previous incarnation got to batch 5 (delta d5) and even compacted v9
    // before its checkpoint was lost. The fresh drain restarts at batch 0 —
    // it must clear those leftovers, or latestState would pick stale v9 /
    // fold stale d5 on top of the new incarnation's state.
    val cfg = ReplicationConfig(runId = 1000L, sideChannelDir = Some(tmp("side")))
    val msgDir = tmp("msgs")
    val stateDir = tmp("state")
    ReplicationJob.export(spark, snapshot(Seq("z0")), cfg).write.mode("overwrite").json(msgDir)

    val ghost = spark.createDataset(Seq(GTable("ghost", "db9")))
      .withColumn("action", lit("create"))
    ghost.write.parquet(s"$stateDir/d5/tables") // torn: other planes missing
    spark.createDataset(Seq(GDatabase("db9"))).write.parquet(s"$stateDir/v9/databases")
    spark.createDataset(Seq(GTable("ghost", "db9"))).write.parquet(s"$stateDir/v9/tables")
    spark.emptyDataset[GPartition].write.parquet(s"$stateDir/v9/partitions")

    val s = MessageStream.runImport(spark, msgDir, stateDir, tmp("ckpt"),
      CatalogSnapshot.empty(spark, "tgt"), cfg)
    assert(tableNames(s) == Set("z0"), "stale leftovers leaked into the drained state")
    val state = new java.io.File(stateDir).listFiles().map(_.getName).toSet
    assert(!state.contains("d5") && !state.contains("v9"), s"stale dirs survived: $state")
  }

  test("redelivery dedup holds across micro-batches (stateful dropDuplicates)") {
    val cfg = ReplicationConfig(runId = 500L, sideChannelDir = Some(tmp("side")))
    val msgs = ReplicationJob.export(spark, snapshot(Seq("d0", "d1")), cfg)
    // deliver the same materialized bytes twice, as SEPARATE files so
    // maxFilesPerTrigger=1 puts the copies in different micro-batches —
    // dedup must rely on streaming state, not intra-batch distinct
    val stage = tmp("stage")
    msgs.coalesce(1).write.mode("overwrite").json(stage)
    val once = spark.read.schema(messageEncoder.schema).json(stage)
    val msgDir = tmp("msgs")
    once.coalesce(1).write.mode("overwrite").json(msgDir)
    once.coalesce(1).write.mode("append").json(msgDir)

    val outDir = tmp("out")
    val q = MessageStream.dedupMessages(
      MessageStream.readMessages(spark, msgDir, maxFilesPerTrigger = Some(1)))
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", tmp("ckpt"))
      .format("parquet").option("path", outDir)
      .start()
    q.awaitTermination()
    val out = spark.read.schema(messageEncoder.schema).parquet(outDir)
    assert(out.count() == msgs.count()) // every copy collapsed to one
  }

  test("digest-keyed dedup: distinct payloads in the same envelope both pass") {
    // dedupMessages keys state on sha2(payload) — identical envelopes with
    // DIFFERENT payloads must not collapse (the digest distinguishes them),
    // proving the constant-size key change didn't widen the dedup semantics.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[CatalogMessage](spark)
    mem.addData(
      CatalogMessage("table", "src", "b1", """{"table":{"name":"t0"}}"""),
      CatalogMessage("table", "src", "b1", """{"table":{"name":"t1"}}"""),
      CatalogMessage("table", "src", "b1", """{"table":{"name":"t0"}}""")) // true duplicate
    val q = MessageStream.dedupMessages(mem.toDS())
      .writeStream.format("memory").queryName("digest_dedup")
      .option("checkpointLocation", tmp("ckpt")).start()
    try { q.processAllAvailable() } finally q.stop()
    val out = spark.table("digest_dedup").as[CatalogMessage].collect()
    assert(out.length == 2)
    assert(out.map(_.payload).toSet.size == 2)
  }

  test("watermarked dedup: duplicates collapse inside the horizon, state ages out past it") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def msg(name: String): CatalogMessage =
      CatalogMessage("table", "src", "b1", s"""{"table":{"name":"$name"}}""")
    def ts(minute: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

    val mem = MemoryStream[(CatalogMessage, java.sql.Timestamp)](spark)
    val stream = mem.toDS().select(col("_1.*"), col("_2").as("arrivalTs")).as[CatalogMessage]
    val deduped = MessageStream.dedupMessagesWithinWatermark(
      stream, delay = "10 minutes", ingestTs = col("arrivalTs"))
    val q = deduped.writeStream.format("memory").queryName("wm_dedup")
      .option("checkpointLocation", tmp("ckpt")).start()
    try {
      mem.addData(msg("a") -> ts(0), msg("a") -> ts(1)) // in-batch duplicate collapses
      q.processAllAvailable()
      mem.addData(msg("a") -> ts(5))                    // in-horizon redelivery collapses
      q.processAllAvailable()
      mem.addData(msg("z") -> ts(40))                   // advances watermark to 10:30 → a's state expires
      q.processAllAvailable()
      mem.addData(msg("a") -> ts(41))                   // beyond the horizon → re-emitted (at-least-once)
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("wm_dedup").as[CatalogMessage].collect()
    assert(out.count(_.payload.contains("\"a\"")) == 2) // once early, once after age-out
    assert(out.count(_.payload.contains("\"z\"")) == 1)
  }

  test("runImport with redelivery dedup converges identically on duplicated drops") {
    val src = snapshot(Seq("e0", "e1"))
    val cfg = ReplicationConfig(runId = 600L, sideChannelDir = Some(tmp("side")))
    val msgDir = tmp("msgs")
    val once = ReplicationJob.export(spark, src, cfg)
    once.coalesce(1).write.mode("overwrite").json(msgDir)
    // redeliver the same bytes as a second file → a later micro-batch
    spark.read.schema(messageEncoder.schema).json(msgDir)
      .coalesce(1).write.mode("append").json(msgDir)

    val s = MessageStream.runImport(spark, msgDir, tmp("state"), tmp("ckpt"),
      CatalogSnapshot.empty(spark, "tgt"), cfg, maxFilesPerTrigger = Some(1),
      dedupRedelivered = true)
    assert(tableNames(s) == Set("e0", "e1"))
    assert(s.partitions.count() == src.partitions.count())
  }

  test("ProcessingTime tail mode: live queue drain with watermarked dedup converges to the batch import") {
    val cfg = ReplicationConfig(runId = 900L, sideChannelDir = Some(tmp("side")))
    val msgDir = tmp("msgs")
    val stateDir = tmp("state")

    // wave 1: two tables, delivered TWICE (visibility-timeout redelivery)
    val w1 = ReplicationJob.export(spark, snapshot(Seq("p0", "p1")), cfg)
    val stage = tmp("stage")
    w1.coalesce(1).write.mode("overwrite").json(stage)
    val once = spark.read.schema(messageEncoder.schema).json(stage)
    once.coalesce(1).write.mode("overwrite").json(msgDir)
    once.coalesce(1).write.mode("append").json(msgDir)

    // the long-lived deployment: ProcessingTime trigger + watermarked dedup
    val q = MessageStream.startImport(spark, msgDir, stateDir, tmp("ckpt"),
      CatalogSnapshot.empty(spark, "tgt"), cfg,
      maxFilesPerTrigger = Some(1),
      dedupWatermark = Some("10 minutes"),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
    try {
      q.processAllAvailable() // wave 1 drained while the query stays LIVE
      assert(tableNames(MessageStream.latestState(spark, stateDir,
        CatalogSnapshot.empty(spark, "tgt"))) == Set("p0", "p1"))

      // wave 2 arrives later — the armed stream picks it up without restart
      ReplicationJob.export(spark, snapshot(Seq("p2")), cfg.copy(runId = 901L))
        .coalesce(1).write.mode("append").json(msgDir)
      q.processAllAvailable()
    } finally q.stop()

    // converged tail state == one-shot batch import of everything delivered
    // (duplicates included — the idempotent apply collapses them either way)
    val tail = MessageStream.latestState(spark, stateDir, CatalogSnapshot.empty(spark, "tgt"))
    val delivered = spark.read.schema(messageEncoder.schema).json(msgDir).as[CatalogMessage]
    val batch = ReplicationJob.importMessages(spark, delivered,
      CatalogSnapshot.empty(spark, "tgt"), cfg).target
    assert(tableNames(tail) == Set("p0", "p1", "p2"))
    assert(tableNames(tail) == tableNames(batch))
    assert(tail.partitions.count() == batch.partitions.count())

    // multiple micro-batches actually ran, and the dedup operator's state is
    // bounded by the DISTINCT message count (duplicates add no state rows),
    // which the watermark then ages out — not by stream length
    val progress = q.recentProgress
    assert(progress.count(_.numInputRows > 0) >= 2, "expected several non-empty micro-batches")
    val distinctMsgs = delivered.dropDuplicates("messageType", "exportBatchId", "payload").count()
    val maxStateRows = progress.flatMap(_.stateOperators.map(_.numRowsTotal)).max
    assert(maxStateRows <= distinctMsgs,
      s"dedup state $maxStateRows exceeds distinct message count $distinctMsgs")
  }

  test("streaming dead letters accumulate for re-drive") {
    val src = snapshot(Seq("x0", "x1"))
    val cfg = ReplicationConfig(runId = 400L, sideChannelDir = Some(tmp("side")),
      applyFailureExpr = Some("messageType = 'table' AND get_json_object(payload, '$.table.name') = 'x0'"))
    val msgDir = tmp("msgs")
    val stateDir = tmp("state")
    ReplicationJob.export(spark, src, cfg).write.mode("overwrite").json(msgDir)

    val s1 = MessageStream.runImport(spark, msgDir, stateDir, tmp("ckpt"),
      CatalogSnapshot.empty(spark, "tgt"), cfg)
    assert(tableNames(s1) == Set("x1"))
    val dead = MessageStream.deadLetters(spark, stateDir)
    assert(dead.count() == 1)
    assert(dead.head().error == "apply failure")

    // re-drive the streamed dead letters through the SAME import path (the
    // DLQ Lambda analogue) — the target converges to the full source set
    val r = graft.run.ReDriveJob.redrive(spark, dead, s1,
      cfg.copy(applyFailureExpr = None))
    assert(tableNames(r.target) == Set("x0", "x1"))
    assert(r.deadLetters.isEmpty)
  }
}
