package graft

import org.apache.spark.sql.functions._

import graft.codec.Codecs._
import graft.model._
import graft.run.{ReplicationConfig, ReplicationJob}
import graft.sources.CatalogSnapshot

/**
 * End-to-end replication specs (SURVEY §5.2.3/5.2.5): export → message plane
 * → import → apply, asserting target convergence, idempotency, the
 * large-table side-channel round-trip, and failure routing.
 */
class ReplicationE2ESpec extends SparkSpec {

  test("replicate and replicateLive leave no lingering CacheManager entries") {
    import graft.catalog._
    val cm = spark.sharedState.cacheManager
    val wasEmpty = cm.isEmpty
    val src = CatalogSnapshot.inMemory(spark, "src",
      Seq(GDatabase("db0")), Seq(GTable("t0", "db0")),
      Seq(GPartition(Seq("p0"), "db0", "t0")))
    val cfg = graft.run.ReplicationConfig(runId = 1L,
      applyFailureExpr = Some("messageType = 'nope'"))
    ReplicationJob.replicate(spark, src, CatalogSnapshot.empty(spark, "tgt"), cfg)
      .target.partitions.count()
    InMemoryGlueCatalog.fresh("cm-live")
    GlueReplication.replicateLive(spark, src, InMemoryClientFactory("cm-live"), cfg)
      .audit.count()
    // The message plane pins via lineage-free localCheckpoint, never cache():
    // a long session running imports in a loop must not accumulate entries.
    if (wasEmpty) assert(cm.isEmpty, "a replication path leaked a cached frame")
  }
  import spark.implicits._

  private def snapshot(id: String, nTables: Int, partsPerTable: Int): CatalogSnapshot = {
    val dbs = Seq(GDatabase("db0"), GDatabase("db1"))
    val tables = (0 until nTables).map(i => GTable(name = s"t$i", databaseName = s"db${i % 2}",
      parameters = Map("k" -> s"v$i")))
    val parts = for {
      i <- 0 until nTables
      p <- 0 until partsPerTable
    } yield GPartition(Seq(s"p$p"), s"db${i % 2}", s"t$i")
    CatalogSnapshot(id, spark.createDataset(dbs), spark.createDataset(tables),
      spark.createDataset(parts))
  }

  private def tableKeys(s: CatalogSnapshot): Set[(String, String)] =
    s.tables.select(col("databaseName"), col("name")).as[(String, String)].collect().toSet

  private def partKeys(s: CatalogSnapshot): Set[(String, String, Seq[String])] =
    s.partitions.select(col("databaseName"), col("tableName"), col("values"))
      .as[(String, String, Seq[String])].collect().toSet

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-e2e").toString

  test("replicate into empty target converges; re-replicate is idempotent (skips/updates only)") {
    val src = snapshot("src", nTables = 4, partsPerTable = 3)
    val cfg = ReplicationConfig(runId = 1L, sideChannelDir = Some(tmpDir()))

    val r1 = ReplicationJob.replicate(spark, src, CatalogSnapshot.empty(spark, "tgt"), cfg)
    assert(tableKeys(r1.target) == tableKeys(src))
    assert(partKeys(r1.target) == partKeys(src))
    assert(r1.deadLetters.count() == 0)

    val r2 = ReplicationJob.replicate(spark, src, r1.target, cfg.copy(runId = 2L))
    assert(tableKeys(r2.target) == tableKeys(src))
    assert(partKeys(r2.target) == partKeys(src))
    // second run: no creates for dbs/tables (all exist), partitions recreated wholesale
    val acts = r2.actions.groupBy("entityKind", "action").count()
      .as[(String, String, Long)].collect().map { case (k, a, n) => (k, a) -> n }.toMap
    assert(!acts.contains(("database", Action.Create)))
    assert(!acts.contains(("table", Action.Create)))
  }

  test("large table over threshold round-trips partitions through the side channel with identity intact") {
    // 12 partitions > threshold 10 → side-channel path; this is the
    // regression test for partitionBy dropping databaseName/tableName.
    val src = snapshot("src", nTables = 2, partsPerTable = 12)
    val cfg = ReplicationConfig(runId = 7L, largeTableThreshold = 10,
      sideChannelDir = Some(tmpDir()))

    val messages = ReplicationJob.export(spark, src, cfg)
    val byType = messages.groupBy("messageType").count().as[(String, Long)].collect().toMap
    assert(byType(MessageType.LargeTable) == 2L)
    assert(byType.get(MessageType.Table).isEmpty)

    val res = ReplicationJob.importMessages(spark, messages,
      CatalogSnapshot.empty(spark, "tgt"), cfg)
    val got = partKeys(res.target)
    assert(got == partKeys(src))
    // identity columns must be real values, never null
    assert(res.target.partitions.where(col("databaseName").isNull || col("tableName").isNull).count() == 0)
  }

  test("mixed small/large export routes by threshold and both import") {
    val dbs = spark.createDataset(Seq(GDatabase("db0")))
    val tables = spark.createDataset(Seq(
      GTable(name = "small", databaseName = "db0"),
      GTable(name = "large", databaseName = "db0")))
    val parts = spark.createDataset(
      (0 until 3).map(p => GPartition(Seq(s"s$p"), "db0", "small")) ++
        (0 until 15).map(p => GPartition(Seq(s"l$p"), "db0", "large")))
    val src = CatalogSnapshot("src", dbs, tables, parts)
    val cfg = ReplicationConfig(runId = 3L, largeTableThreshold = 10,
      sideChannelDir = Some(tmpDir()))
    val messages = ReplicationJob.export(spark, src, cfg)
    val byType = messages.groupBy("messageType").count().as[(String, Long)].collect().toMap
    assert(byType(MessageType.Table) == 1L && byType(MessageType.LargeTable) == 1L)

    val res = ReplicationJob.importMessages(spark, messages, CatalogSnapshot.empty(spark, "t"), cfg)
    assert(partKeys(res.target) == partKeys(src))
  }

  test("large table with no sideChannelDir fails fast instead of silently losing partitions") {
    val src = snapshot("src", nTables = 1, partsPerTable = 20)
    val cfg = ReplicationConfig(runId = 4L, largeTableThreshold = 10, sideChannelDir = None)
    val e = intercept[IllegalArgumentException] {
      ReplicationJob.export(spark, src, cfg).count()
    }
    assert(e.getMessage.contains("sideChannelDir"))
  }

  test("malformed payloads route to dead letters, valid ones still apply") {
    val src = snapshot("src", nTables = 2, partsPerTable = 1)
    val cfg = ReplicationConfig(runId = 5L, sideChannelDir = Some(tmpDir()))
    val good = ReplicationJob.export(spark, src, cfg)
    val poison = spark.createDataset(Seq(
      CatalogMessage(MessageType.Table, "src", "5", """{"table": {"name": }garbage"""),
      CatalogMessage(MessageType.Database, "src", "5", """not json at all"""),
      // NULL messageType (an all-null corrupt parse): three-valued logic on
      // `isin` must not drop it — NULL type is unknown type, dead-lettered
      CatalogMessage(null, "src", "5", """{"database": {"name": "dbx"}}""")))
    val res = ReplicationJob.importMessages(spark, good.unionByName(poison),
      CatalogSnapshot.empty(spark, "tgt"), cfg)
    assert(res.deadLetters.count() == 3)
    assert(res.deadLetters.where(col("error") === "malformed payload").count() == 2)
    assert(res.deadLetters.where(col("error") === "unknown messageType").count() == 1)
    assert(tableKeys(res.target) == tableKeys(src))
  }

  test("duplicate message delivery (at-least-once) converges to the same target") {
    val src = snapshot("src", nTables = 3, partsPerTable = 2)
    val cfg = ReplicationConfig(runId = 6L, sideChannelDir = Some(tmpDir()))
    val messages = ReplicationJob.export(spark, src, cfg)
    val doubled = messages.unionByName(messages)
    val once = ReplicationJob.importMessages(spark, messages, CatalogSnapshot.empty(spark, "t1"), cfg)
    val twice = ReplicationJob.importMessages(spark, doubled, CatalogSnapshot.empty(spark, "t2"), cfg)
    assert(tableKeys(once.target) == tableKeys(twice.target))
    assert(partKeys(once.target) == partKeys(twice.target))
    assert(once.target.tables.count() == twice.target.tables.count())
  }

  test("fan-out: one export plane converges N targets with different initial states") {
    val src = snapshot("src", nTables = 4, partsPerTable = 3)
    val cfg = ReplicationConfig(runId = 9L, sideChannelDir = Some(tmpDir()))
    // target A empty; target B already holds a stale extra partition of t0
    // and an unrelated table the export never mentions
    val tgtB = CatalogSnapshot("tgtB",
      spark.createDataset(Seq(GDatabase("db0"))),
      spark.createDataset(Seq(
        GTable(name = "t0", databaseName = "db0"),
        GTable(name = "keepme", databaseName = "db0"))),
      spark.createDataset(Seq(GPartition(Seq("stale"), "db0", "t0"))))
    val (results, cleanup) = ReplicationJob.replicateFanOut(spark, src,
      Seq(CatalogSnapshot.empty(spark, "tgtA"), tgtB), cfg)
    try {
      val Seq(ra, rb) = results
      assert(tableKeys(ra.target) == tableKeys(src))
      assert(partKeys(ra.target) == partKeys(src))
      // B converges on the exported set, the stale partition is wholesale-
      // replaced, and the unexported table is untouched
      assert(partKeys(rb.target) == partKeys(src))
      assert(tableKeys(rb.target) == tableKeys(src) + (("db0", "keepme")))
      // both results carry the SAME export-side audit rows
      val exA = ra.audit.where(col("action") === "export").count()
      val exB = rb.audit.where(col("action") === "export").count()
      assert(exA == exB && exA > 0)
    } finally cleanup()
  }

  test("prefix planner scopes the export (P1/P2)") {
    val src = snapshot("src", nTables = 4, partsPerTable = 1)
    val cfg = ReplicationConfig(runId = 8L, prefixes = Seq("db0"),
      sideChannelDir = Some(tmpDir()))
    val res = ReplicationJob.replicate(spark, src, CatalogSnapshot.empty(spark, "tgt"), cfg)
    assert(res.target.databases.select("name").as[String].collect().toSet == Set("db0"))
    assert(tableKeys(res.target).forall(_._1 == "db0"))
  }
}
