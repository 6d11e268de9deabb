package graft.streaming

import java.util.{Map => JMap}

import scala.collection.mutable

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.codec.Codecs

/**
 * §2.10 — the message queue as a REAL DataSourceV2 `MicroBatchStream`,
 * replacing the file-drop stand-in with the full streaming-connector
 * contract: explicit offsets, admission control, and a commit callback.
 *
 * The reference consumes SQS one message per Lambda invocation
 * (template.yaml:275 batch size 1; ImportDatabaseOrTable.java:43-73); this
 * source models the same queue as a directory of append-only JSON-lines
 * files and implements what the reference delegates to SQS:
 *
 *  - **Offsets** are a single global message SEQUENCE NUMBER. The mapping
 *    seq → (file, row) is pinned by a driver-side file log persisted under
 *    the stream's checkpoint (`graft-queue-files.log`): a file gets its
 *    position (and its message count) appended ON DISCOVERY and never
 *    re-ordered — a late-arriving file that sorts lexically earlier cannot
 *    shift offsets already committed. This log is the source-side half of
 *    exactly-once: the engine's offset log names `[start, end)` sequences,
 *    and this log makes those sequences stable across restarts.
 *  - **Admission control** (`maxOffsetsPerTrigger`, the SQS batch-size
 *    knob): `SupportsAdmissionControl.latestOffset(start, limit)` caps each
 *    micro-batch at N MESSAGES — not files — so a drain of a 1M-message
 *    backlog proceeds in bounded, checkpointed steps. AvailableNow is
 *    honored properly via `SupportsTriggerAvailableNow`: the target is
 *    pinned once at query start and drained in admission-limited batches.
 *  - **commit(end)** is the queue-deletion analogue (the reference deletes
 *    the SQS message after a successful import): the acknowledged sequence
 *    is recorded in `graft-queue-ack` under the checkpoint; a real SQS
 *    binding would delete messages `< end` here. Reading never depends on
 *    the ack — redelivery after a crash-before-commit replays the same
 *    `[start, end)` range, the documented at-least-once contract.
 *  - **Corrupt lines** surface as rows with null `messageType` and the raw
 *    line in `payload` — the P6 dispatch routes them to the DLQ, exactly
 *    like the file-drop path (never silently dropped, never a poison pill).
 *
 * Scale: planning is O(new files) per trigger on the driver (list + count
 * once per file, memoized in the log — a real queue service hands counts
 * over the API); reading is executor-side, one `InputPartition` per file
 * slice, so a wide batch fans across the cluster. Message payloads never
 * touch the driver.
 */
object MessageQueueSource {
  /** Queue-depth metadata: total messages currently in `dir`, from the same
    * file-listing + non-empty-line count the stream's own discovery uses —
    * NOT a Spark JSON scan. This is the `ApproximateNumberOfMessages`
    * attribute a real SQS binding would read to size admission; callers use
    * it to pick a per-trigger cap (e.g. ceil(depth/3) for a 3-batch drain)
    * without paying a parse job over the whole backlog first. */
  def backlogCount(spark: org.apache.spark.sql.SparkSession, dir: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(dir)
    val f = p.getFileSystem(conf)
    if (!f.exists(p)) return 0L
    f.listStatus(p).iterator
      .filter(s => s.isFile && !s.getPath.getName.startsWith(".")
        && !s.getPath.getName.startsWith("_"))
      .map { s =>
        val in = f.open(s.getPath)
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().count(_.nonEmpty).toLong
        finally in.close()
      }.sum
  }
}

class MessageQueueSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-queue"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Codecs.messageEncoder.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new MessageQueueTable(schema)
}

private[streaming] class MessageQueueTable(messageSchema: StructType)
  extends Table with SupportsRead {
  override def name(): String = "graft-queue"
  override def schema(): StructType = messageSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = messageSchema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
          val path = Option(options.get("path")).getOrElse(
            throw new IllegalArgumentException("graft-queue: 'path' option is required"))
          val maxPerTrigger = Option(options.get("maxOffsetsPerTrigger")).map(_.toLong)
          new MessageQueueStream(path, checkpointLocation, maxPerTrigger, messageSchema)
        }
      }
    }
}

/** Offset = count of messages consumed from the global sequence. */
case class MessageSeqOffset(seq: Long) extends Offset {
  override def json(): String = seq.toString
}

private[streaming] class MessageQueueStream(
    dir: String,
    checkpointLocation: String,
    maxPerTrigger: Option[Long],
    schema: StructType)
  extends MicroBatchStream with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  private val hadoopConf =
    org.apache.spark.SparkContext.getOrCreate().hadoopConfiguration
  private def fs: FileSystem = new Path(dir).getFileSystem(hadoopConf)

  /** Discovery-ordered (path, messageCount) — the offset-stability log. */
  private val files = mutable.ArrayBuffer.empty[(String, Long)]
  private val known = mutable.HashSet.empty[String]
  private var availableNowTarget: Option[Long] = None

  private def logPath = new Path(checkpointLocation, "graft-queue-files.log")
  private def ackPath = new Path(checkpointLocation, "graft-queue-ack")

  loadLog()

  private def loadLog(): Unit = {
    val f = fs
    if (f.exists(logPath)) {
      val in = f.open(logPath)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().foreach { line =>
        val i = line.indexOf('\t')
        if (i > 0) {
          val n = line.substring(0, i).toLong
          val p = line.substring(i + 1)
          if (!known.contains(p)) { files += ((p, n)); known += p }
        }
      } finally in.close()
    }
  }

  /** Atomic swap of tmp over dst. delete-then-rename would leave a window
    * where a crash loses the file entirely — for the offset-stability log
    * that means a restart rebuilds file order by lexical discovery, and a
    * late-arriving file that sorts earlier would remap already-committed
    * [start,end) sequence ranges to different messages. FileContext.rename
    * with OVERWRITE is the HDFS-contract atomic replace. */
  private def atomicSwap(tmp: Path, dst: Path): Unit =
    org.apache.hadoop.fs.FileContext.getFileContext(dst.toUri, hadoopConf)
      .rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)

  private def persistLog(): Unit = {
    val f = fs
    val tmp = new Path(checkpointLocation, "graft-queue-files.log.tmp")
    val out = f.create(tmp, true)
    try out.write(files.map { case (p, n) => s"$n\t$p" }.mkString("", "\n", "\n")
      .getBytes("UTF-8"))
    finally out.close()
    atomicSwap(tmp, logPath)
  }

  /** Count non-empty lines (the parse-side contract skips empty lines too). */
  private def countMessages(f: FileSystem, p: Path): Long = {
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().count(_.nonEmpty)
    finally in.close()
  }

  /** List the queue dir; append files never seen before (sorted among
    * themselves for determinism), count their messages, persist the log. */
  private def discover(): Unit = {
    val f = fs
    val p = new Path(dir)
    if (!f.exists(p)) return
    val fresh = f.listStatus(p).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith(".")
        && !s.getPath.getName.startsWith("_"))
      .map(_.getPath)
      .filterNot(q => known.contains(q.toString))
      .sortBy(_.getName)
    if (fresh.nonEmpty) {
      fresh.foreach { q => files += ((q.toString, countMessages(f, q))); known += q.toString }
      persistLog()
    }
  }

  private def totalAvailable: Long = files.iterator.map(_._2).sum

  // ------------------------------------------------------------ the contract

  override def initialOffset(): Offset = MessageSeqOffset(0L)

  override def deserializeOffset(json: String): Offset = MessageSeqOffset(json.toLong)

  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(n => ReadLimit.maxRows(n)).getOrElse(ReadLimit.allAvailable())

  override def prepareForTriggerAvailableNow(): Unit = {
    discover()
    availableNowTarget = Some(totalAvailable)
  }

  /** Plain latestOffset is never called when admission control is present. */
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "graft-queue uses latestOffset(start, limit) — admission-controlled")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    // AvailableNow pins its target at prepare time: files dropped mid-drain
    // wait for the next query run (the reference's next cron kick)
    if (availableNowTarget.isEmpty) discover()
    val avail = availableNowTarget.getOrElse(totalAvailable)
    val from = start.asInstanceOf[MessageSeqOffset].seq
    def capOf(l: ReadLimit): Long = l match {
      case r: ReadMaxRows => from + r.maxRows()
      case _: ReadAllAvailable => Long.MaxValue
      case composite: org.apache.spark.sql.connector.read.streaming.CompositeReadLimit =>
        composite.getReadLimits.map(capOf).min
      case _ => Long.MaxValue // ReadMinRows etc.: serve what is available
    }
    MessageSeqOffset(math.min(avail, capOf(limit)))
  }

  override def reportLatestOffset(): Offset = MessageSeqOffset(totalAvailable)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[MessageSeqOffset].seq
    val to = end.asInstanceOf[MessageSeqOffset].seq
    // a restart can replan a range discovered in a previous incarnation
    // before discover() has run this incarnation — the log has it
    if (totalAvailable < to) discover()
    require(totalAvailable >= to,
      s"graft-queue: offset $to beyond known messages $totalAvailable — file log out of sync")
    val parts = mutable.ArrayBuffer.empty[InputPartition]
    var cum = 0L
    files.foreach { case (path, n) =>
      val fileStart = cum
      val fileEnd = cum + n
      val s = math.max(from, fileStart)
      val e = math.min(to, fileEnd)
      if (s < e) parts += MessageFilePartition(path, s - fileStart, e - fileStart)
      cum = fileEnd
    }
    parts.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new MessageQueueReaderFactory(schema)

  /** The queue-deletion hook: record the acknowledged sequence (a real SQS
    * binding deletes messages < end here). Never read back on the read
    * path — replay of an uncommitted range stays possible. */
  override def commit(end: Offset): Unit = {
    val f = fs
    val tmp = new Path(checkpointLocation, "graft-queue-ack.tmp")
    val out = f.create(tmp, true)
    try out.write(end.json().getBytes("UTF-8")) finally out.close()
    atomicSwap(tmp, ackPath)
  }

  override def stop(): Unit = ()
}

/** One contiguous message slice [startRow, endRow) of one queue file. */
case class MessageFilePartition(path: String, startRow: Long, endRow: Long)
  extends InputPartition

private[streaming] class MessageQueueReaderFactory(schema: StructType)
  extends PartitionReaderFactory {

  private val payloadIdx = schema.fieldIndex("payload")

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[MessageFilePartition]
    new PartitionReader[InternalRow] {
      private val conf = new org.apache.hadoop.conf.Configuration()
      private val in = new Path(p.path).getFileSystem(conf).open(new Path(p.path))
      private val lines = scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().filter(_.nonEmpty)
        .slice(p.startRow.toInt, p.endRow.toInt)
      private val parse = GraftSqlBridge.jsonLineParser(schema)
      private var row: InternalRow = _

      override def next(): Boolean =
        if (!lines.hasNext) false
        else {
          val line = lines.next()
          row = parse(line)
          if (row == null) {
            // corrupt line → null-typed row carrying the raw bytes; the
            // dispatch stage (P6) routes it to the DLQ
            val r = new GenericInternalRow(schema.length)
            r.update(payloadIdx, UTF8String.fromString(line))
            row = r
          }
          true
        }

      override def get(): InternalRow = row
      override def close(): Unit = in.close()
    }
  }
}
