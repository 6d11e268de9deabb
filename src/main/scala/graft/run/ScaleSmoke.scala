package graft.run

import org.apache.spark.sql.SparkSession

import graft.codec.Codecs._
import graft.model._
import graft.sources.CatalogSnapshot

/**
 * Scale smoke for the BASELINE.md derived throughput target: 1k databases /
 * 10k tables / ~1.09M partitions reconciled in ONE replication run (the
 * reference needs ~10k Lambda invocations at SQS batch size 1 for the same
 * work). 9,900 tables ride the small branch (100 partitions each, inlined
 * message lists bounded by the threshold) and 100 ride the large branch
 * (1,000 partitions each, JSON-lines side channel) so both routing paths
 * carry real volume. Prints one JSON line with counts + seconds.
 *
 * Not part of `sbt test` (it's a minutes-scale job); run with
 * `sbt "runMain graft.run.ScaleSmoke"`.
 */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nDbs = 1000
    val nSmallTables = 9900L
    val partsPerSmall = 100L
    val nLargeTables = 100L
    val partsPerLarge = 1000L

    val dbs = spark.range(nDbs).map(i => GDatabase(s"db$i"))
    val tables = spark.range(nSmallTables + nLargeTables)
      .map(i => GTable(name = s"t$i", databaseName = s"db${i % nDbs}"))
    val smallParts = spark.range(nSmallTables * partsPerSmall).map { id =>
      val t = id / partsPerSmall
      GPartition(Seq(s"p${id % partsPerSmall}"), s"db${t % nDbs}", s"t$t")
    }
    val largeParts = spark.range(nLargeTables * partsPerLarge).map { id =>
      val t = nSmallTables + id / partsPerLarge
      GPartition(Seq(s"p${id % partsPerLarge}"), s"db${t % nDbs}", s"t$t")
    }
    val src = CatalogSnapshot("src", dbs, tables,
      smallParts.unionByName(largeParts).as[GPartition])

    val side = java.nio.file.Files.createTempDirectory("graft-scale-side").toString
    val cfg = ReplicationConfig(runId = 1L, largeTableThreshold = 500,
      sideChannelDir = Some(side))

    val t0 = System.nanoTime()
    val res = ReplicationJob.replicate(spark, src, CatalogSnapshot.empty(spark, "tgt"), cfg)
    val nDbsOut = res.target.databases.count()
    val nTablesOut = res.target.tables.count()
    val nPartsOut = res.target.partitions.count()
    val nDead = res.deadLetters.count()
    val sec = (System.nanoTime() - t0) / 1e9

    val expectedParts = nSmallTables * partsPerSmall + nLargeTables * partsPerLarge
    assert(nDbsOut == nDbs.toLong, s"databases: $nDbsOut != $nDbs")
    assert(nTablesOut == nSmallTables + nLargeTables, s"tables: $nTablesOut")
    assert(nPartsOut == expectedParts, s"partitions: $nPartsOut != $expectedParts")
    assert(nDead == 0L, s"dead letters: $nDead")
    println(s"""{"metric":"scale_smoke_sec","value":$sec,"databases":$nDbsOut,"tables":$nTablesOut,"partitions":$nPartsOut}""")
    spark.stop()
  }
}
