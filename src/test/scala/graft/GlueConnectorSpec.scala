package graft

import org.apache.spark.sql.functions._

import graft.catalog._
import graft.codec.Codecs._
import graft.model._
import graft.run.{ReplicationConfig, ReplicationJob}
import graft.sources.CatalogSnapshot

/**
 * Contract spec for the live GlueCatalog connector: the mock-backed live
 * replicate must land EXACTLY the state the fixture (snapshot-fold) replicate
 * computes, while observably respecting the Glue API contract — pagination,
 * batch limits (100 create / 25 delete), skipArchive passthrough, bounded
 * retry on throttling (reference: GlueUtil.java:84-105,264-350,406-420,
 * 500-512; ExportDatabaseWithTables.java:76-77; ImportDatabaseOrTable.java:
 * 47-48).
 */
class GlueConnectorSpec extends SparkSpec {
  import spark.implicits._

  private def db(name: String): GDatabase = GDatabase(name, description = Some(s"desc-$name"))
  private def tbl(dbName: String, name: String): GTable =
    GTable(name, dbName, owner = Some("o"), parameters = Map("k" -> name))
  private def part(dbName: String, tbl: String, v: Int): GPartition =
    GPartition(Seq(v.toString), dbName, tbl, parameters = Map("p" -> v.toString))

  /** Seed both a mock catalog and an equivalent fixture snapshot with the
    * same pre-existing target state. */
  private def seed(mock: InMemoryGlueCatalog, dbs: Seq[GDatabase], tables: Seq[GTable], parts: Seq[GPartition]): CatalogSnapshot = {
    dbs.foreach(mock.createDatabase)
    tables.foreach(mock.createTable)
    parts.groupBy(p => (p.databaseName, p.tableName)).foreach { case ((d, t), ps) =>
      ps.grouped(GlueLimits.BatchCreatePartitions).foreach { g =>
        assert(mock.batchCreatePartitions(d, t, g).isEmpty)
      }
    }
    mock.clearCallLog()
    // The fixture target must match what the mock stored (DatabaseInput drops createTimeMs).
    CatalogSnapshot.inMemory(spark, mock.catalogId,
      dbs.map(_.copy(createTimeMs = None)), tables, parts)
  }

  private def srcSnapshot(nPartsBigTable: Int): CatalogSnapshot = {
    // beta carries a source-side createTime: DatabaseInput must drop it in
    // BOTH apply paths (the catalog stamps its own — GlueUtil.java:146-152),
    // so the equivalence assertion below also pins that projection.
    val dbs = Seq(db("alpha"), db("beta").copy(createTimeMs = Some(1700000000000L)))
    val tables = Seq(tbl("alpha", "t1"), tbl("alpha", "big"), tbl("beta", "t2"))
    val parts =
      (1 to 3).map(part("alpha", "t1", _)) ++
        (1 to nPartsBigTable).map(part("alpha", "big", _)) ++
        (1 to 5).map(part("beta", "t2", _))
    CatalogSnapshot.inMemory(spark, "src", dbs, tables, parts)
  }

  private val cfg = ReplicationConfig(runId = 7L, largeTableThreshold = 1000)

  test("mock-backed live replicate lands exactly the fixture-replicate state") {
    val src = srcSnapshot(nPartsBigTable = 250)
    // Pre-existing target state: one table to update, stale partitions to
    // wholesale-delete (37 > one delete batch), one untouched foreign table.
    val preDbs = Seq(db("alpha"), db("keep"))
    val preTables = Seq(tbl("alpha", "t1").copy(owner = Some("stale")), tbl("keep", "foreign"))
    val preParts = (100 to 136).map(part("alpha", "t1", _)) :+ part("keep", "foreign", 1)

    val mock = InMemoryGlueCatalog.fresh("live-eq")
    val fixtureTgt = seed(mock, preDbs, preTables, preParts)

    val live = GlueReplication.replicateLive(spark, src, InMemoryClientFactory("live-eq"), cfg)
    val fixture = ReplicationJob.replicate(spark, src, fixtureTgt, cfg)

    assert(live.statuses.where(!col("ok")).count() === 0)
    // the live run carries the SAME audit plane the fixture run writes
    assert(live.audit.collect().toSet === fixture.audit.collect().toSet)
    assert(mock.allDatabases.toSet === fixture.target.databases.collect().toSet)
    assert(mock.allDatabases.find(_.name == "beta").get.createTimeMs.isEmpty)
    assert(mock.allTables.toSet === fixture.target.tables.collect().toSet)
    assert(mock.allPartitions.toSet === fixture.target.partitions.collect().toSet)
    // The stale t1 partitions are gone, the foreign table's survive.
    assert(!mock.allPartitions.exists(p => p.tableName == "t1" && p.values.head.toInt >= 100))
    assert(mock.allPartitions.exists(_.tableName == "foreign"))
  }

  test("live replicate carries large tables over the S3 side channel") {
    // threshold 50 routes 'big' (250 partitions) through the stub-message +
    // JSON-lines side-channel path (S6) — the live sink must land them all.
    val src = srcSnapshot(nPartsBigTable = 250)
    val sideCfg = cfg.copy(largeTableThreshold = 50,
      sideChannelDir = Some(java.nio.file.Files.createTempDirectory("live-side").toString))
    val mock = InMemoryGlueCatalog.fresh("live-large")
    seed(mock, Seq.empty, Seq.empty, Seq.empty)

    val res = GlueReplication.replicateLive(spark, src, InMemoryClientFactory("live-large"), sideCfg)
    assert(res.statuses.where(!col("ok")).count() === 0)
    assert(res.deadLetters.count() === 0)
    assert(mock.allPartitions.count(_.tableName == "big") === 250)
    assert(mock.allPartitions.size === 250 + 3 + 5)
    // the stub message really took the side channel (payload carries no list)
    val stub = res.messages.where(col("messageType") === "largeTable").collect()
    assert(stub.length === 1 && stub.head.s3BucketName.isDefined)
  }

  test("batch calls respect the service limits: create<=100, delete<=25, exact chunk counts") {
    val src = srcSnapshot(nPartsBigTable = 250)
    val mock = InMemoryGlueCatalog.fresh("live-chunk")
    seed(mock, Seq(db("alpha")), Seq(tbl("alpha", "big")), (500 to 536).map(part("alpha", "big", _)))

    GlueReplication.replicateLive(spark, src, InMemoryClientFactory("live-chunk"), cfg)

    val creates = mock.calls.filter(_.op == "BatchCreatePartition").map(_.batchSize)
    val deletes = mock.calls.filter(_.op == "BatchDeletePartition").map(_.batchSize)
    assert(creates.forall(_ <= GlueLimits.BatchCreatePartitions))
    assert(deletes.forall(_ <= GlueLimits.BatchDeletePartitions))
    assert(creates.sum === 3 + 250 + 5)
    // 250 partitions of one table co-locate into one task: 100+100+50.
    assert(creates.count(_ == 100) === 2)
    // 37 stale deletes: 25 + 12.
    assert(deletes.sorted === Seq(12, 25))
  }

  test("table fetch paginates: pageSize 7 over 25 tables") {
    val mock = InMemoryGlueCatalog.fresh("live-page", pageSize = 7)
    mock.createDatabase(db("alpha"))
    (1 to 25).foreach(i => mock.createTable(tbl("alpha", s"t$i")))
    mock.clearCallLog()

    val snap = GlueCatalogSource.snapshot(spark, InMemoryClientFactory("live-page"))
    assert(snap.tables.count() === 25)
    assert(mock.callCount("GetTables") === 4) // ceil(25/7)
    assert(snap.tables.collect().map(_.name).toSet === (1 to 25).map(i => s"t$i").toSet)
  }

  test("segmented partition fetch covers the plane exactly once and fans out the scan") {
    val mock = InMemoryGlueCatalog.fresh("live-seg", pageSize = 50)
    mock.createDatabase(db("alpha"))
    mock.createTable(tbl("alpha", "huge"))
    (1 to 400).grouped(100).foreach(g =>
      assert(mock.batchCreatePartitions("alpha", "huge", g.map(part("alpha", "huge", _))).isEmpty))
    mock.clearCallLog()

    val plain = GlueCatalogSource.snapshot(spark, InMemoryClientFactory("live-seg"))
    val plainCalls = mock.callCount("GetPartitions")
    assert(plain.partitions.count() === 400)
    assert(plainCalls === 8) // 400 rows / 50 per page, one serial chain

    mock.clearCallLog()
    val segmented = GlueCatalogSource.snapshot(spark, InMemoryClientFactory("live-seg"),
      partitionSegments = 4)
    // disjoint + complete: same 400 partitions, no dup, no loss
    assert(segmented.partitions.collect().toSet === plain.partitions.collect().toSet)
    // each of the 4 segments pages independently — at least one call per
    // segment, and the longest chain shrinks from 8 pages to ~2
    assert(mock.callCount("GetPartitions") >= 4)
  }

  test("pruned fetch of entities absent on the target: service throws EntityNotFound, snapshot is empty") {
    val mock = InMemoryGlueCatalog.fresh("live-absent")
    mock.createDatabase(db("alpha")) // db exists; the tables do not
    // Real-API fidelity first: the mock must THROW for missing parents, so
    // the source-side handling below is exercised, not vacuous.
    intercept[GlueEntityNotFoundException](mock.getPartitions("alpha", "ghost", None))
    intercept[GlueEntityNotFoundException](mock.getTables("no-such-db", None))

    // The per-micro-batch fetch shape: messages name a db and tables that are
    // about to be CREATED — point gets miss, partition pages throw, and the
    // snapshot must come back EMPTY instead of failing the batch.
    val snap = GlueCatalogSource.snapshotForKeys(spark, InMemoryClientFactory("live-absent"),
      GlueSinkConfig(), Seq("alpha", "new-db"), Seq(("alpha", "ghost"), ("new-db", "t1")))
    assert(snap.databases.collect().map(_.name).toSeq === Seq("alpha"))
    assert(snap.tables.count() === 0)
    assert(snap.partitions.count() === 0)

    // Segmented fetch takes the same path per (db, table, segment) key.
    val seg = GlueCatalogSource.snapshotForKeys(spark, InMemoryClientFactory("live-absent"),
      GlueSinkConfig(), Seq("alpha"), Seq(("alpha", "ghost")), partitionSegments = 4)
    assert(seg.partitions.count() === 0)
  }

  test("skipArchive passes through to UpdateTable") {
    def run(skip: Boolean, key: String): InMemoryGlueCatalog = {
      val mock = InMemoryGlueCatalog.fresh(key)
      seed(mock, Seq(db("alpha")), Seq(tbl("alpha", "t1").copy(owner = Some("old"))), Seq(part("alpha", "t1", 1)))
      val src = CatalogSnapshot.inMemory(spark, "src",
        Seq(db("alpha")), Seq(tbl("alpha", "t1")), Seq(part("alpha", "t1", 1)))
      GlueReplication.replicateLive(spark, src, InMemoryClientFactory(key), cfg,
        GlueSinkConfig(skipArchive = skip))
      mock
    }
    val archiving = run(skip = false, "live-arch")
    assert(archiving.archivedVersions.map(_.owner) === Seq(Some("old")))
    val skipping = run(skip = true, "live-skiparch")
    assert(skipping.archivedVersions.isEmpty)
  }

  test("throttling retries up to maxErrorRetry, then surfaces as a status error") {
    val src = CatalogSnapshot.inMemory(spark, "src", Seq(db("alpha")), Seq.empty, Seq.empty)

    val ok = InMemoryGlueCatalog.fresh("live-retry-ok")
    ok.throttleNext("CreateDatabase", 3)
    val res = GlueReplication.replicateLive(spark, src, InMemoryClientFactory("live-retry-ok"), cfg,
      GlueSinkConfig(maxErrorRetry = 10))
    assert(res.statuses.where(!col("ok")).count() === 0)
    assert(ok.callCount("CreateDatabase") === 4) // 3 throttled + 1 success
    assert(ok.allDatabases.map(_.name) === Seq("alpha"))

    val starved = InMemoryGlueCatalog.fresh("live-retry-starved")
    starved.throttleNext("CreateDatabase", 3)
    val res2 = GlueReplication.replicateLive(spark, src, InMemoryClientFactory("live-retry-starved"), cfg,
      GlueSinkConfig(maxErrorRetry = 1))
    val bad = res2.statuses.where(!col("ok")).collect()
    assert(bad.length === 1)
    assert(bad.head.error.get.contains("GlueThrottlingException"))
    assert(starved.allDatabases.isEmpty)

    // the failed entity dead-letters at MESSAGE granularity (the reference's
    // DLQ unit), and re-driving those messages after the fault clears
    // converges the target — the live-mode DLQ round trip
    val dead = res2.deadLetters.collect()
    assert(dead.length === 1 && dead.head.messageType === "database")
    val redrive = GlueReplication.applyMessagesLive(spark,
      graft.run.ReDriveJob.messagesOf(res2.deadLetters),
      InMemoryClientFactory("live-retry-starved"), cfg)
    assert(redrive.statuses.where(!col("ok")).count() === 0)
    assert(starved.allDatabases.map(_.name) === Seq("alpha"))
  }

  test("streaming live import drains micro-batches into the service and equals the batch live run") {
    import spark.implicits._
    val src = srcSnapshot(nPartsBigTable = 30)
    val msgDir = java.nio.file.Files.createTempDirectory("live-stream-msgs").toString
    ReplicationJob.export(spark, src, cfg).repartition(3)
      .write.mode("overwrite").json(msgDir)
    // one corrupt message — must land in the DLQ dir, not vanish past the checkpoint
    spark.createDataset(Seq(CatalogMessage("table", "src", cfg.batchId, "{not json")))
      .coalesce(1).write.mode("append").json(msgDir)

    val streamed = InMemoryGlueCatalog.fresh("live-stream")
    val dlqDir = java.nio.file.Files.createTempDirectory("live-stream-dlq").toString
    val statusDir = java.nio.file.Files.createTempDirectory("live-stream-status").toString
    val statuses = graft.streaming.MessageStream.runLiveImport(
      spark, msgDir, InMemoryClientFactory("live-stream"),
      java.nio.file.Files.createTempDirectory("live-stream-ckpt").toString,
      dlqDir, statusDir, cfg, maxFilesPerTrigger = Some(1))
    // statuses came back off-driver (a lazy read of the persisted plane)
    assert(statuses.count() > 0 && statuses.where(!col("ok")).count() === 0)
    assert(graft.streaming.MessageStream.statusesAt(spark, statusDir).count() === statuses.count())

    // dead letters survive the drained checkpoint
    val dead = graft.streaming.MessageStream.deadLettersAt(spark, dlqDir).collect()
    assert(dead.length === 1 && dead.head.error === "malformed payload")

    // per-batch fetches are point gets for the batch's keys, never a crawl
    assert(streamed.callCount("GetDatabases") === 0)
    assert(streamed.callCount("GetTables") === 0)
    assert(streamed.callCount("GetDatabase") > 0)
    assert(streamed.callCount("GetTable") > 0)

    val batched = InMemoryGlueCatalog.fresh("live-batch-ref")
    GlueReplication.replicateLive(spark, src, InMemoryClientFactory("live-batch-ref"), cfg)

    // Databases compare by name, not full row: a micro-batch can deliver a
    // table before its database message, creating an implicit placeholder
    // db, and the reference's decision table says exists → SKIP (never
    // update) — so a fragmented drain may keep the placeholder's empty
    // description where the single-batch run lands the real one
    // (README.md:259-261; GDCUtil's create-on-EntityNotFound then skip).
    assert(streamed.allDatabases.map(_.name).toSet === batched.allDatabases.map(_.name).toSet)
    assert(streamed.allTables.toSet === batched.allTables.toSet)
    assert(streamed.allPartitions.toSet === batched.allPartitions.toSet)
  }

  test("many-file backlog drains in capped micro-batches with point fetches bounded by distinct keys") {
    // 120 one-message files naming only THREE tables over and over — the
    // redelivered-flood shape. The default maxFilesPerTrigger (64) must split
    // the backlog into several micro-batches, and the pruned fetch must issue
    // point gets per DISTINCT key per batch, never per message.
    val src = CatalogSnapshot.inMemory(spark, "src",
      Seq(db("alpha")), (0 until 3).map(i => tbl("alpha", s"t$i")),
      (0 until 3).flatMap(i => (1 to 2).map(part("alpha", s"t$i", _))))
    val msgs = ReplicationJob.export(spark, src, cfg).collect()
    val flood = (0 until 60).flatMap(_ => msgs) // 240 messages, 4 identities
    val msgDir = java.nio.file.Files.createTempDirectory("live-backlog-msgs").toString
    spark.createDataset(flood).repartition(200).write.mode("overwrite").json(msgDir)
    val nFiles = new java.io.File(msgDir).listFiles().count(_.getName.endsWith(".json"))
    assert(nFiles > 64, s"need more files than one capped batch, got $nFiles")

    val mock = InMemoryGlueCatalog.fresh("live-backlog")
    val statusDir = java.nio.file.Files.createTempDirectory("live-backlog-status").toString
    graft.streaming.MessageStream.runLiveImport(
      spark, msgDir, InMemoryClientFactory("live-backlog"),
      java.nio.file.Files.createTempDirectory("live-backlog-ckpt").toString,
      java.nio.file.Files.createTempDirectory("live-backlog-dlq").toString,
      statusDir, cfg)

    // the default cap split the backlog — more than one micro-batch ran
    val batchIds = spark.read.parquet(statusDir).select("batchId").distinct().count()
    assert(batchIds >= 2, s"backlog drained as $batchIds batch(es) — cap not applied")
    // point fetches: ≤ distinct keys per batch (3 tables + 1 db), NOT per
    // message (120 table messages would mean hundreds of GetTable calls)
    assert(mock.callCount("GetTable") <= batchIds * 3,
      s"GetTable called ${mock.callCount("GetTable")} times across $batchIds batches")
    assert(mock.callCount("GetDatabase") <= batchIds * 1)
    assert(mock.callCount("GetTables") === 0) // never a crawl
    // and the flood converged to exactly the source state
    assert(mock.allTables.map(_.name).toSet === Set("t0", "t1", "t2"))
    assert(mock.allPartitions.size === 6)
  }

  test("pruned fetch caps its driver collect: a batch naming 10k identities falls back to the crawl, same result") {
    // 10,000 DISTINCT table identities in ONE batch: the point-get plan
    // would put 10k tuples on the driver; over the cap the fetch must fall
    // back to the full snapshot (constant driver memory, one listing crawl)
    // and produce the IDENTICAL catalog state and statuses.
    val n = 10000
    val src = CatalogSnapshot.inMemory(spark, "src",
      Seq(db("wide")), (0 until n).map(i => tbl("wide", s"t$i")), Seq.empty)
    val msgs = ReplicationJob.export(spark, src, cfg)

    val mockCapped = InMemoryGlueCatalog.fresh("live-cap-on")
    val capped = GlueReplication.applyMessagesLive(spark, msgs,
      InMemoryClientFactory("live-cap-on"), cfg,
      pruneFetchToMessages = true, pruneFetchMaxKeys = 1000)
    val cappedOk = capped.statuses.collect()
    // cap engaged: the crawl ran (GetDatabases listing — the target is
    // empty, so no per-db GetTables chains follow), zero point GetTable
    assert(mockCapped.callCount("GetDatabases") >= 1,
      s"cap did not engage — calls: ${mockCapped.calls.distinct}")
    assert(mockCapped.callCount("GetTable") === 0)

    val mockPruned = InMemoryGlueCatalog.fresh("live-cap-off")
    val pruned = GlueReplication.applyMessagesLive(spark, msgs,
      InMemoryClientFactory("live-cap-off"), cfg,
      pruneFetchToMessages = true, pruneFetchMaxKeys = 1000000)
    val prunedOk = pruned.statuses.collect()
    // under the cap the point plan ran: no table-listing crawl at all
    assert(mockPruned.callCount("GetTable") > 0)

    // identical converged state and identical per-entity outcomes
    assert(mockCapped.allTables.map(_.name).toSet === mockPruned.allTables.map(_.name).toSet)
    assert(mockCapped.allTables.map(_.name).size === n)
    assert(cappedOk.map(s => (s.entityKind, s.databaseName, s.tableName, s.action, s.ok))
        .sorted.toSeq ===
      prunedOk.map(s => (s.entityKind, s.databaseName, s.tableName, s.action, s.ok))
        .sorted.toSeq)
  }

  test("ProcessingTime live tail: newly dropped message files keep draining into the service") {
    // the reference's always-armed SQS→Lambda→Glue wiring (template.yaml:275):
    // the import is a LONG-LIVED stream and the queue grows underneath it
    val srcA = CatalogSnapshot.inMemory(spark, "src",
      Seq(db("alpha")), Seq(tbl("alpha", "t1")), (1 to 3).map(part("alpha", "t1", _)))
    val srcB = CatalogSnapshot.inMemory(spark, "src",
      Seq(db("beta")), Seq(tbl("beta", "t2")), (1 to 2).map(part("beta", "t2", _)))
    val msgDir = java.nio.file.Files.createTempDirectory("live-tail-msgs").toString
    ReplicationJob.export(spark, srcA, cfg).coalesce(1).write.mode("append").json(msgDir)

    val mock = InMemoryGlueCatalog.fresh("live-tail")
    val statusDir = java.nio.file.Files.createTempDirectory("live-tail-status").toString
    val q = graft.streaming.MessageStream.startLiveImport(
      spark, msgDir, InMemoryClientFactory("live-tail"),
      java.nio.file.Files.createTempDirectory("live-tail-ckpt").toString,
      java.nio.file.Files.createTempDirectory("live-tail-dlq").toString,
      statusDir, cfg,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("250 milliseconds"))
    try {
      q.processAllAvailable()
      // first drop applied while the stream stays live
      assert(mock.allDatabases.map(_.name).toSet === Set("alpha"))
      assert(mock.allPartitions.size === 3)
      // the queue grows AFTER the stream started — the tail must pick it up
      ReplicationJob.export(spark, srcB, cfg).coalesce(1).write.mode("append").json(msgDir)
      q.processAllAvailable()
    } finally q.stop()

    // converged tail state equals one batch live apply of everything
    val combined = CatalogSnapshot.inMemory(spark, "src",
      Seq(db("alpha"), db("beta")), Seq(tbl("alpha", "t1"), tbl("beta", "t2")),
      (1 to 3).map(part("alpha", "t1", _)) ++ (1 to 2).map(part("beta", "t2", _)))
    val ref = InMemoryGlueCatalog.fresh("live-tail-ref")
    GlueReplication.replicateLive(spark, combined, InMemoryClientFactory("live-tail-ref"), cfg)
    assert(mock.allDatabases.map(_.name).toSet === ref.allDatabases.map(_.name).toSet)
    assert(mock.allTables.toSet === ref.allTables.toSet)
    assert(mock.allPartitions.toSet === ref.allPartitions.toSet)
    // statuses accumulated across the tail's batches, all green
    val statuses = graft.streaming.MessageStream.statusesAt(spark, statusDir)
    assert(statuses.count() > 0 && statuses.where(!col("ok")).count() === 0)
  }

  test("redelivery converges: a second identical live run changes nothing and stays green") {
    val src = srcSnapshot(nPartsBigTable = 12)
    val mock = InMemoryGlueCatalog.fresh("live-idem")
    seed(mock, Seq.empty, Seq.empty, Seq.empty)

    GlueReplication.replicateLive(spark, src, InMemoryClientFactory("live-idem"), cfg)
    val after1 = (mock.allDatabases.toSet, mock.allTables.toSet, mock.allPartitions.toSet)

    val res2 = GlueReplication.replicateLive(spark, src, InMemoryClientFactory("live-idem"), cfg)
    assert(res2.statuses.where(!col("ok")).count() === 0)
    val after2 = (mock.allDatabases.toSet, mock.allTables.toSet, mock.allPartitions.toSet)
    assert(after1 === after2)
    // Second run re-fetched live state, so creates became updates/skips.
    assert(res2.actions.where(col("entityKind") === "table" && col("action") === "create").count() === 0)
  }
}
