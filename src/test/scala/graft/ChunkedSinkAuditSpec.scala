package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.functions._

import graft.codec.Codecs._
import graft.model._
import graft.operators.ChunkedSink
import graft.run.{ReplicationConfig, ReplicationJob}
import graft.sources.CatalogSnapshot

/** A3 chunked-sink batching + export/import audit plane coverage. */
class ChunkedSinkAuditSpec extends SparkSpec {
  import spark.implicits._

  test("foreachChunk delivers every row in bounded chunks, executor-side") {
    val n = 1037
    val chunkSize = ChunkedSink.CreatePartitionChunk // 100
    ChunkedSinkAuditSpec.sink.clear()
    val ds = spark.range(n).repartition(4).as[java.lang.Long].map(_.toLong)
    ChunkedSink.foreachChunk(ds, chunkSize) { chunk =>
      ChunkedSinkAuditSpec.sink.add(chunk.toVector)
    }
    val chunks = {
      val it = ChunkedSinkAuditSpec.sink.iterator()
      val b = Vector.newBuilder[Vector[Long]]
      while (it.hasNext) b += it.next()
      b.result()
    }
    assert(chunks.map(_.size).forall(_ <= chunkSize))
    assert(chunks.flatten.sorted == (0L until n).toVector)
    // 4 partitions of ~259 rows → ceil(259/100)=3 chunks each
    assert(chunks.count(_.size == chunkSize) >= 8)
  }

  test("delete/audit batch chunk size (25) applies independently") {
    assert(ChunkedSink.DeletePartitionChunk == 25 && ChunkedSink.AuditBatchChunk == 25)
    ChunkedSinkAuditSpec.sink.clear()
    val ds = spark.range(60).coalesce(1).as[java.lang.Long].map(_.toLong)
    ChunkedSink.foreachChunk(ds, ChunkedSink.AuditBatchChunk)(c =>
      ChunkedSinkAuditSpec.sink.add(c.toVector))
    val sizes = {
      val it = ChunkedSinkAuditSpec.sink.iterator()
      val b = Vector.newBuilder[Int]
      while (it.hasNext) b += it.next().size
      b.result()
    }
    assert(sizes.sorted == Vector(10, 25, 25))
  }

  test("A2 export counters surface through observe() on the export pass itself") {
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    @volatile var observed: Option[org.apache.spark.sql.Row] = None
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
        qe.observedMetrics.get("export_metrics_55").foreach(r => observed = Some(r))
      }
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val src = CatalogSnapshot("src",
        spark.createDataset(Seq(GDatabase("db0"), GDatabase("db1"))),
        spark.createDataset((0 until 5).map(i => GTable(name = s"t$i", databaseName = "db0"))),
        spark.createDataset(Seq(GPartition(Seq("p0"), "db0", "t0"))))
      ReplicationJob.export(spark, src, ReplicationConfig(runId = 55L))
        .write.format("noop").mode("overwrite").save()
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      while (observed.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      val row = observed.getOrElse(fail("observe() metrics never arrived"))
      assert(row.getAs[Long]("n_databases") == 2L)
      assert(row.getAs[Long]("n_tables") == 5L)
      assert(row.getAs[Long]("n_large_tables") == 0L)
    } finally spark.listenerManager.unregister(listener)
  }

  test("replicate audit spans export and import sides, latest-per-entity window works") {
    val src = CatalogSnapshot("src",
      spark.createDataset(Seq(GDatabase("db0"))),
      spark.createDataset(Seq(GTable(name = "t0", databaseName = "db0"))),
      spark.createDataset(Seq(GPartition(Seq("p0"), "db0", "t0"))))
    val cfg = ReplicationConfig(runId = 77L,
      sideChannelDir = Some(java.nio.file.Files.createTempDirectory("a").toString))
    val res = ReplicationJob.replicate(spark, src, CatalogSnapshot.empty(spark, "tgt"), cfg)

    val audit = res.audit.collect()
    assert(audit.exists(a => a.action == "export" && a.entityKind == "database"))
    assert(audit.exists(a => a.action == "export" && a.entityKind == "table" && a.entityId == "t0|db0"))
    assert(audit.exists(a => a.action == Action.Create && a.entityKind == "table"))
    // the reference's DDB key+sort-key lookup as a window: latest action per entity
    val latest = res.audit
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("entityId"), col("entityKind"))
          .orderBy(col("action")))) // deterministic tiebreak for the spec
      .where(col("rn") === 1)
    assert(latest.count() > 0)
  }
}

object ChunkedSinkAuditSpec {
  /** Shared collector — valid in local[*] where executors share the JVM. */
  val sink = new ConcurrentLinkedQueue[Vector[Long]]()
}
