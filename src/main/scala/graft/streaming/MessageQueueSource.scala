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

  /** Discovery-ordered per-file records — the offset-stability log. */
  private val files = mutable.ArrayBuffer.empty[QueueFileMeta]
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
        // `count \t path [\t sync,sync,...]` — the third field (byte-offset
        // sync points) is absent in logs written before syncs existed; such
        // files simply read from byte 0 (the pre-sync behavior).
        val parts = line.split('\t')
        if (parts.length >= 2 && parts(0).nonEmpty) {
          val n = parts(0).toLong
          val p = parts(1)
          val syncs = if (parts.length >= 3 && parts(2).nonEmpty)
            parts(2).split(',').map(_.toLong) else Array.empty[Long]
          if (!known.contains(p)) { files += QueueFileMeta(p, n, syncs); known += p }
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
    try out.write(files.map(m => s"${m.n}\t${m.path}\t${m.syncs.mkString(",")}")
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    atomicSwap(tmp, logPath)
  }

  /** Count non-empty lines (the parse-side contract skips empty lines too),
    * recording a byte-offset sync point every [[QueueLines.SyncEvery]]
    * messages: the discovery pass reads the file once anyway, and the sync
    * points let a reader assigned rows deep inside a large file seek near
    * its slice instead of re-scanning from byte 0 — without them a wide
    * batch over one big file is O(file) PER PARTITION. */
  private def countMessages(f: FileSystem, p: Path): QueueFileMeta = {
    val in = f.open(p)
    try {
      val lr = new QueueLines(in, 0L)
      var n = 0L
      val syncs = mutable.ArrayBuffer.empty[Long]
      var done = false
      while (!done) {
        val start = lr.bytePos
        val line = lr.nextLineUtf8()
        if (line == null) done = true
        else if (line.numBytes > 0) {
          if (n > 0 && n % QueueLines.SyncEvery == 0) syncs += start
          n += 1
        }
      }
      QueueFileMeta(p.toString, n, syncs.toArray)
    } finally in.close()
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
      fresh.foreach { q => files += countMessages(f, q); known += q.toString }
      persistLog()
    }
  }

  private def totalAvailable: Long = files.iterator.map(_.n).sum

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
    files.foreach { m =>
      val fileStart = cum
      val fileEnd = cum + m.n
      val s = math.max(from, fileStart)
      val e = math.min(to, fileEnd)
      if (s < e) {
        val relStart = s - fileStart
        // Seek target: the sync point at or below relStart, so the reader
        // skips at most SyncEvery lines. A log generation written before
        // sync points (empty syncs) falls back to byte 0.
        val block = relStart / QueueLines.SyncEvery
        val (seekPos, seekRow) =
          if (block > 0 && m.syncs.length >= block)
            (m.syncs((block - 1).toInt), block * QueueLines.SyncEvery)
          else (0L, 0L)
        parts += MessageFilePartition(m.path, relStart, e - fileStart, seekPos, seekRow)
      }
      cum = fileEnd
    }
    parts.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // the session's Hadoop configuration must travel to the executor-side
    // readers — a bare `new Configuration()` there would drop any FS
    // settings (s3a credentials, custom schemes) the driver discovered with
    new MessageQueueReaderFactory(schema,
      new org.apache.spark.util.SerializableConfiguration(hadoopConf))

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

/** Per-file discovery record persisted in the offset-stability log:
  * non-empty-line count plus byte-offset sync points — `syncs(i)` is the
  * byte offset of the line holding non-empty row `(i+1) * SyncEvery`. */
private[streaming] case class QueueFileMeta(path: String, n: Long, syncs: Array[Long])

/** One contiguous message slice [startRow, endRow) of one queue file.
  * `seekPos`/`seekRow`: the sync point at or below `startRow` — the reader
  * seeks there and skips `startRow - seekRow` (≤ SyncEvery) lines, so a
  * wide batch split across one large file costs O(slice) per partition,
  * not O(file). All offsets are Long: a file may hold more than 2^31
  * messages. */
case class MessageFilePartition(path: String, startRow: Long, endRow: Long,
    seekPos: Long = 0L, seekRow: Long = 0L) extends InputPartition

/** Byte-exact line iteration shared by the discovery (count + sync points)
  * and read paths. `scala.io.Source` cannot serve here: it counts AFTER
  * UTF-8 decode and newline folding, so it can't report the raw byte offset
  * a reader must `seek()` to. Splits on '\n' and strips one trailing '\r'
  * (the `Source.getLines` contract the parse side was written against). */
private[streaming] object QueueLines {
  val SyncEvery: Long = 4096L
}

private[streaming] final class QueueLines(in: java.io.InputStream, startPos: Long) {
  // Own buffer + newline scan (r17): the previous shape pulled one byte per
  // BufferedInputStream.read() call — a SYNCHRONIZED method, ~30M monitor
  // acquisitions per discovery/read pass over this fixture — and decoded
  // every line to java.lang.String only for the read path to re-encode it
  // to UTF-8 for the row. Lines now stay raw bytes end to end; byte
  // offsets are unchanged (same '\n' split, same '\r' strip).
  private val buf = new Array[Byte](1 << 16)
  private var bufLen = 0
  private var bufPos = 0
  private var eof = false
  private var pos = startPos
  private val line = new java.io.ByteArrayOutputStream(256)

  /** Byte offset of the next unread line's first byte. */
  def bytePos: Long = pos

  private def fill(): Unit = {
    if (!eof) {
      bufPos = 0
      bufLen = in.read(buf)
      if (bufLen < 0) { eof = true; bufLen = 0 }
    }
  }

  /** Next line's bytes (terminators stripped) as UTF8String, or null at end
    * of stream. The returned value owns a fresh array — safe to retain. */
  def nextLineUtf8(): org.apache.spark.unsafe.types.UTF8String = {
    if (bufPos >= bufLen) {
      fill()
      if (eof && bufLen == 0) return null
    }
    line.reset()
    var sawNl = false
    var done = false
    while (!done) {
      if (bufPos >= bufLen) {
        fill()
        if (bufLen == 0) done = true // EOF: emit what accumulated
      }
      if (!done) {
        var i = bufPos
        while (i < bufLen && buf(i) != '\n') i += 1
        line.write(buf, bufPos, i - bufPos)
        if (i < bufLen) { sawNl = true; done = true; bufPos = i + 1 }
        else bufPos = i
      }
    }
    pos += line.size() + (if (sawNl) 1L else 0L)
    val arr = line.toByteArray
    val len = if (arr.nonEmpty && arr(arr.length - 1) == '\r') arr.length - 1 else arr.length
    org.apache.spark.unsafe.types.UTF8String.fromBytes(arr, 0, len)
  }

  /** Next line as String — discovery-log convenience over [[nextLineUtf8]]. */
  def nextLine(): String = {
    val u = nextLineUtf8()
    if (u == null) null else u.toString
  }
}

private[streaming] class MessageQueueReaderFactory(schema: StructType,
    conf: org.apache.spark.util.SerializableConfiguration)
  extends PartitionReaderFactory {

  private val payloadIdx = schema.fieldIndex("payload")

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[MessageFilePartition]
    new PartitionReader[InternalRow] {
      private val in = {
        val s = new Path(p.path).getFileSystem(conf.value).open(new Path(p.path))
        s.seek(p.seekPos) // sync points are line starts — clean UTF-8 boundary
        s
      }
      private val lines = new QueueLines(in, p.seekPos)
      private var rowIdx: Long = p.seekRow // non-empty lines consumed so far
      private val parse = GraftSqlBridge.jsonLineParserUtf8(schema)
      private var row: InternalRow = _

      override def next(): Boolean = {
        // bounded skip from the sync point to the slice start
        while (rowIdx < p.startRow) {
          val l = lines.nextLineUtf8()
          if (l == null) return false
          if (l.numBytes > 0) rowIdx += 1
        }
        if (rowIdx >= p.endRow) return false
        var line = lines.nextLineUtf8()
        while (line != null && line.numBytes == 0) line = lines.nextLineUtf8()
        if (line == null) return false
        rowIdx += 1
        row = parse(line)
        if (row == null) {
          // corrupt line → null-typed row carrying the raw bytes; the
          // dispatch stage (P6) routes it to the DLQ
          val r = new GenericInternalRow(schema.length)
          r.update(payloadIdx, line)
          row = r
        }
        true
      }

      override def get(): InternalRow = row
      override def close(): Unit = in.close()
    }
  }
}
