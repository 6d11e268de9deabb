package graft

import org.apache.spark.sql.functions._

import graft.codec.Codecs._
import graft.model._
import graft.run.{ReDriveJob, ReplicationConfig, ReplicationJob}
import graft.sources.CatalogSnapshot

/**
 * DLQ failure-path specs (SURVEY §5.2.5): apply-time failures land in dead
 * letters with the full original message; ReDriveJob re-runs the import over
 * them through the same code path and converges the target
 * (GDCUtil.java:112-116; DLQImportDatabaseOrTable.java:126-166).
 */
class DlqRedriveSpec extends SparkSpec {
  import spark.implicits._

  private def snapshot(nTables: Int, partsPerTable: Int): CatalogSnapshot = {
    val dbs = Seq(GDatabase("db0"))
    val tables = (0 until nTables).map(i => GTable(name = s"t$i", databaseName = "db0"))
    val parts = for { i <- 0 until nTables; p <- 0 until partsPerTable }
      yield GPartition(Seq(s"p$p"), "db0", s"t$i")
    CatalogSnapshot("src", spark.createDataset(dbs), spark.createDataset(tables),
      spark.createDataset(parts))
  }

  private def tableNames(s: CatalogSnapshot): Set[String] =
    s.tables.select("name").as[String].collect().toSet

  test("injected apply failures dead-letter whole messages; redrive converges the target") {
    val src = snapshot(nTables = 4, partsPerTable = 2)
    val side = java.nio.file.Files.createTempDirectory("graft-dlq").toString
    // poison: every table message whose table name ends in an even digit
    val poison = "messageType = 'table' AND " +
      "get_json_object(payload, '$.table.name') IN ('t0', 't2')"
    val cfg = ReplicationConfig(runId = 11L, sideChannelDir = Some(side),
      applyFailureExpr = Some(poison))

    val messages = ReplicationJob.export(spark, src, cfg)
    val r1 = ReplicationJob.importMessages(spark, messages,
      CatalogSnapshot.empty(spark, "tgt"), cfg)

    assert(tableNames(r1.target) == Set("t1", "t3"))
    val dead = r1.deadLetters.collect()
    assert(dead.length == 2)
    assert(dead.forall(_.error == "apply failure"))
    // partitions of failed tables must not half-apply
    assert(r1.target.partitions.select("tableName").as[String].collect().toSet == Set("t1", "t3"))

    // re-drive with the failure gone → target converges to the full source
    val r2 = ReDriveJob.redrive(spark, r1.deadLetters, r1.target, cfg.copy(applyFailureExpr = None))
    assert(tableNames(r2.target) == Set("t0", "t1", "t2", "t3"))
    assert(r2.target.partitions.count() == src.partitions.count())
    assert(r2.deadLetters.count() == 0)
  }

  test("still-failing messages dead-letter again on redrive (at-least-once)") {
    val src = snapshot(nTables = 2, partsPerTable = 1)
    val side = java.nio.file.Files.createTempDirectory("graft-dlq").toString
    val poison = "messageType = 'table' AND get_json_object(payload, '$.table.name') = 't0'"
    val cfg = ReplicationConfig(runId = 12L, sideChannelDir = Some(side),
      applyFailureExpr = Some(poison))
    val r1 = ReplicationJob.replicate(spark, src, CatalogSnapshot.empty(spark, "tgt"), cfg)
    val r2 = ReDriveJob.redrive(spark, r1.deadLetters, r1.target, cfg) // same poison
    assert(r2.deadLetters.count() == 1)
    assert(tableNames(r2.target) == Set("t1"))
  }

  test("large-table dead letters retain side-channel coords; redrive restores partitions") {
    val src = snapshot(nTables = 1, partsPerTable = 15)
    val side = java.nio.file.Files.createTempDirectory("graft-dlq").toString
    val cfg = ReplicationConfig(runId = 13L, largeTableThreshold = 10,
      sideChannelDir = Some(side),
      applyFailureExpr = Some("messageType = 'largeTable'"))
    val r1 = ReplicationJob.replicate(spark, src, CatalogSnapshot.empty(spark, "tgt"), cfg)
    assert(r1.target.partitions.count() == 0)
    val dl = r1.deadLetters.head()
    assert(dl.messageType == MessageType.LargeTable && dl.s3BucketName.nonEmpty)

    val r2 = ReDriveJob.redrive(spark, r1.deadLetters, r1.target, cfg.copy(applyFailureExpr = None))
    assert(r2.target.partitions.count() == 15)
    assert(r2.target.partitions.where(col("tableName").isNull).count() == 0)
  }
}
