package graft.run

import org.apache.spark.sql.SparkSession

import graft.catalog._
import graft.codec.Codecs._
import graft.model._
import graft.sources.CatalogSnapshot

/**
 * Scale smoke for the LIVE connector path: 50 databases / 500 tables /
 * 150k partitions exported, planned, and applied through GlueSink's batch
 * calls against the in-memory mock service (≥1,500 BatchCreatePartition
 * calls at the 100-row service limit, issued executor-side from 32 tasks),
 * then re-fetched with a 4-segment parallel snapshot and verified complete.
 *
 * The reference performs the same apply as one Lambda invocation per
 * table-message with serial 100-row loops inside
 * (GlueUtil.java:406-430); here every table's chunk run is a task-local
 * iterator walk and the calls fan out across the cluster.
 *
 * Not part of `sbt test`; run with `sbt "runMain graft.run.GlueScaleSmoke"`.
 */
object GlueScaleSmoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nDbs = 50
    val nTables = 500L
    val partsPerTable = 300L

    val dbs = spark.range(nDbs).map(i => GDatabase(s"db$i"))
    val tables = spark.range(nTables)
      .map(i => GTable(name = s"t$i", databaseName = s"db${i % nDbs}"))
    val parts = spark.range(nTables * partsPerTable).map { id =>
      val t = id / partsPerTable
      GPartition(Seq(s"p${id % partsPerTable}"), s"db${t % nDbs}", s"t$t")
    }
    val src = CatalogSnapshot("src", dbs, tables, parts.as[GPartition])

    val mock = InMemoryGlueCatalog.fresh("scale", pageSize = 1000)
    val factory = InMemoryClientFactory("scale")
    val cfg = ReplicationConfig(runId = 1L, largeTableThreshold = 1000000)

    val t0 = System.nanoTime()
    val res = GlueReplication.replicateLive(spark, src, factory, cfg)
    val nBad = res.statuses.where(org.apache.spark.sql.functions.col("ok") === false).count()
    val applySec = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val snap = GlueCatalogSource.snapshot(spark, factory, partitionSegments = 4)
    val nPartsOut = snap.partitions.count()
    val fetchSec = (System.nanoTime() - t1) / 1e9

    // Same 150k-partition fetch through the DataSourceV2 relation: one
    // InputPartition per (db, segment) = 200 tasks, pagination chains
    // walked lazily at page granularity inside each task.
    val t2 = System.nanoTime()
    val nPartsV2 = spark.read.format("glue-catalog")
      .option("plane", "partitions").option("catalogId", "scale")
      .option("partitionSegments", "4").load()
      .count()
    val fetchV2Sec = (System.nanoTime() - t2) / 1e9

    val nCreateCalls = mock.callCount("BatchCreatePartition")
    val expected = nTables * partsPerTable
    assert(nBad == 0L, s"failed statuses: $nBad")
    assert(nPartsOut == expected, s"partitions: $nPartsOut != $expected")
    assert(nPartsV2 == expected, s"v2 partitions: $nPartsV2 != $expected")
    assert(mock.allPartitions.size == expected.toInt)
    assert(nCreateCalls >= (expected / GlueLimits.BatchCreatePartitions).toInt,
      s"batch calls: $nCreateCalls")
    println(s"""{"metric":"glue_scale_smoke_sec","apply_sec":$applySec,"fetch_sec":$fetchSec,"fetch_v2_sec":$fetchV2Sec,"partitions":$nPartsOut,"batch_create_calls":$nCreateCalls}""")
    spark.stop()
  }
}
