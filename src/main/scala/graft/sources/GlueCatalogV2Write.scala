package graft.sources

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.{AgnosticEncoder, ExpressionEncoder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.catalog.{GlueAlreadyExistsException, GlueCatalogClient, GlueClientFactory, GlueEntityNotFoundException, GlueLimits}
import graft.codec.Codecs
import graft.model._

/**
 * V2 WRITE path for the glue-catalog relation: `df.write.format("glue-catalog")
 * .option("plane", ...).mode("append").save()` plays a plane against the live
 * service with the import Lambdas' semantics — append = idempotent upsert:
 *
 *  - databases: CreateDatabase; AlreadyExists converges (redelivered create,
 *    GlueUtil.java:155-165);
 *  - tables: CreateTable with cross-fallback to UpdateTable(skipArchive), and
 *    the reference's create-db-then-retry recovery when the parent database
 *    is absent (GDCUtil.java:47-57);
 *  - partitions: per-(db, table) buffers flushed as BatchCreatePartition
 *    calls at the service limit (GlueUtil.java:414-420), AlreadyExists
 *    entries converged — task memory is bounded by distinct keys per task ×
 *    chunk size, so co-locating the frame on (databaseName, tableName)
 *    upstream (as GlueSink does) keeps buffers small and batches full.
 *
 * At-least-once by construction: a retried task replays idempotent upserts.
 * Deletes are not expressible as an append — wholesale partition reconcile
 * stays with GlueSink playing an ImportPlan. Overwrite mode is deliberately
 * unsupported (no SupportsTruncate): truncating a catalog is not a
 * replication semantic the reference has.
 */
private[sources] final class GluePlaneWriteBuilder(
    options: CaseInsensitiveStringMap, plane: String, schema: StructType) extends WriteBuilder {
  require(schema.fieldNames.sameElements(GlueCatalogV2.schemaFor(plane).fieldNames),
    s"glue-catalog $plane write expects columns " +
      s"${GlueCatalogV2.schemaFor(plane).fieldNames.mkString(", ")}; got ${schema.fieldNames.mkString(", ")}")
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new GluePlaneBatchWrite(options, plane)
  }
}

private[sources] final class GluePlaneBatchWrite(
    options: CaseInsensitiveStringMap, plane: String) extends BatchWrite {
  private val factory = GlueCatalogV2.buildFactory(options)
  private val (maxRetry, retryDelayMs) = GlueCatalogV2.retryOf(options)
  private val skipArchive = options.getBoolean("skipArchive", false)
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new GluePlaneWriterFactory(plane, factory, maxRetry, retryDelayMs, skipArchive)
  // The effects are idempotent service upserts issued by the writers as they
  // go (the reference's Lambdas have no transaction either); nothing to
  // finalize or roll back at job level.
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private final case class GlueWriteCommit(rows: Long) extends WriterCommitMessage

private[sources] final class GluePlaneWriterFactory(
    plane: String, factory: GlueClientFactory, maxRetry: Int, retryDelayMs: Long,
    skipArchive: Boolean) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GluePlaneDataWriter(plane, factory, maxRetry, retryDelayMs, skipArchive)
}

private[sources] final class GluePlaneDataWriter(
    plane: String, factory: GlueClientFactory, maxRetry: Int, retryDelayMs: Long,
    skipArchive: Boolean) extends DataWriter[InternalRow] {

  private val client = GlueCatalogClient.withRetry(factory.client(), maxRetry, retryDelayMs)
  private var n = 0L

  private def deser[T](enc: org.apache.spark.sql.Encoder[T]): InternalRow => T =
    ExpressionEncoder(enc.asInstanceOf[AgnosticEncoder[T]]).resolveAndBind().createDeserializer()

  private lazy val dbOf = deser(Codecs.dbEncoder)
  private lazy val tableOf = deser(Codecs.tableEncoder)
  private lazy val partOf = deser(Codecs.partitionEncoder)

  /** partitions plane: rows buffered per (db, table), flushed at the service
    * limit so every call is as full as the arriving interleave allows. */
  private val buf = mutable.LinkedHashMap.empty[(String, String), mutable.ArrayBuffer[GPartition]]

  override def write(row: InternalRow): Unit = {
    n += 1
    plane match {
      case "databases" =>
        try client.createDatabase(dbOf(row))
        catch { case _: GlueAlreadyExistsException => () } // converged

      case "tables" =>
        val t = tableOf(row)
        def upsert(): Unit =
          try client.createTable(t)
          catch { case _: GlueAlreadyExistsException => client.updateTable(t, skipArchive) }
        try upsert()
        catch {
          case _: GlueEntityNotFoundException =>
            // Parent database absent: create it, then retry the table — the
            // reference's dbNotFoundError recovery (GDCUtil.java:47-57).
            try client.createDatabase(GDatabase(t.databaseName))
            catch { case _: GlueAlreadyExistsException => () }
            upsert()
        }

      case "partitions" =>
        val p = partOf(row)
        val b = buf.getOrElseUpdate((p.databaseName, p.tableName), mutable.ArrayBuffer.empty)
        b += p
        if (b.length >= GlueLimits.BatchCreatePartitions) flush(p.databaseName, p.tableName, b)
    }
  }

  private def flush(db: String, tbl: String, b: mutable.ArrayBuffer[GPartition]): Unit = {
    val errs = client.batchCreatePartitions(db, tbl, b.toSeq)
    // AlreadyExists entries are a redelivered/retried batch converging, not
    // failures (GlueUtil.java:421-428 logs and continues); anything else
    // fails the task so Spark retries it (at-least-once).
    val real = errs.filterNot(_.errorCode == "AlreadyExistsException")
    if (real.nonEmpty)
      throw new RuntimeException(
        s"BatchCreatePartition failed for $db.$tbl: ${real.head.errorCode}: ${real.head.message}")
    b.clear()
  }

  override def commit(): WriterCommitMessage = {
    buf.foreach { case ((d, t), b) => if (b.nonEmpty) flush(d, t, b) }
    GlueWriteCommit(n)
  }
  override def abort(): Unit = buf.clear()
  override def close(): Unit = ()
}
