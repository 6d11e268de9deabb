package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicBoolean

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.codec.Codecs
import graft.model.CatalogMessage

/**
 * The DataSourceV2 MicroBatchStream contract (MessageQueueSource): offsets,
 * admission control, AvailableNow pinning, crash/replay semantics (no lost
 * message, no duplicated apply), offset stability under late-sorting file
 * arrival, corrupt-line routing, and the commit/ack hook.
 */
class MessageQueueSourceSpec extends SparkSpec {
  import spark.implicits._

  private def msg(i: Int): CatalogMessage =
    CatalogMessage("table", "cat", s"batch$i", s"""{"name":"t$i","databaseName":"db0"}""")

  /** One JSON-lines queue file per group, named so listing order == write order. */
  private def writeQueueFile(dir: String, name: String, msgs: Seq[CatalogMessage]): Unit = {
    val lines = msgs.map(m =>
      s"""{"messageType":"${m.messageType}","sourceCatalogId":"${m.sourceCatalogId}",""" +
      s""""exportBatchId":"${m.exportBatchId}","payload":${ujsonEscape(m.payload)}}""")
    Files.write(java.nio.file.Paths.get(dir, name),
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))
  }

  private def ujsonEscape(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c => c.toString
    } + "\""

  private def readQueue(dir: String, maxPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.format("graft-queue").option("path", dir)
    maxPerTrigger.foreach(n => r.option("maxOffsetsPerTrigger", n))
    r.load()
  }

  test("admission control: AvailableNow drains in ceil(total/max) batches of <= max messages") {
    val dir = Files.createTempDirectory("mq-admission").toString
    (0 until 3).foreach(f => writeQueueFile(dir, f"file$f%02d.jsonl",
      (f * 10 until (f + 1) * 10).map(msg)))
    val ckpt = Files.createTempDirectory("mq-admission-ckpt").toString
    val batches = mutable.ArrayBuffer.empty[(Long, Long)] // (batchId, rows)
    val seen = mutable.ArrayBuffer.empty[String]
    val q = readQueue(dir, maxPerTrigger = Some(7))
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
        val rows = b.collect()
        batches.synchronized { batches += ((id, rows.length.toLong)); seen ++= rows.map(_.getString(2)) }
        ()
      }.start()
    q.awaitTermination()
    assert(batches.map(_._2).sum == 30)
    assert(batches.forall(_._2 <= 7), s"batch over admission cap: $batches")
    assert(batches.size == 5, s"expected ceil(30/7)=5 batches, got $batches") // 7+7+7+7+2
    assert(seen.sorted == (0 until 30).map(i => s"batch$i").sorted)
    // commit hook (the engine hands the source `<ckpt>/sources/<i>` as its
    // private state dir): acks land on batch BOUNDARIES, and the engine
    // delivers batch N's commit when batch N+1 is constructed — so an
    // AvailableNow drain may stop before the final range's ack arrives.
    // The queue-deletion contract only needs acked ≤ committed, advancing:
    // un-acked tail messages are redelivery candidates, and the import is
    // idempotent under redelivery by design.
    val ack = new String(Files.readAllBytes(
      java.nio.file.Paths.get(ckpt, "sources", "0", "graft-queue-ack")), "UTF-8").toLong
    assert(ack >= 21L && ack <= 30L && (ack % 7 == 0 || ack == 30L),
      s"ack $ack is not a committed batch boundary")
  }

  test("crash before commit: the SAME [start,end) range replays — nothing lost, nothing skipped") {
    val dir = Files.createTempDirectory("mq-crash").toString
    writeQueueFile(dir, "f0.jsonl", (0 until 12).map(msg))
    val ckpt = Files.createTempDirectory("mq-crash-ckpt").toString
    val collected = mutable.Map.empty[Long, Seq[String]] // batchId → exportBatchIds
    val boom = new AtomicBoolean(true)
    def run(): Unit = {
      val q = readQueue(dir, maxPerTrigger = Some(5))
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
          val ids = b.collect().map(_.getString(2)).toSeq
          if (id == 1 && boom.getAndSet(false))
            throw new RuntimeException("synthetic crash before batch-1 commit")
          collected.synchronized {
            // replay must deliver the SAME range for the same batch id
            collected.get(id).foreach(prev => assert(prev.sorted == ids.sorted,
              s"batch $id replayed with different content: $prev vs $ids"))
            collected(id) = ids
          }
          ()
        }.start()
      try q.awaitTermination()
      catch { case e: org.apache.spark.sql.streaming.StreamingQueryException =>
        assert(e.getMessage.contains("synthetic crash")) }
    }
    run() // dies inside batch 1
    run() // restart from the checkpoint: batch 1 replays, drain completes
    val all = collected.values.flatten.toSeq
    assert(all.size == 12, s"lost or duplicated messages across replay: $collected")
    assert(all.sorted == (0 until 12).map(i => s"batch$i").sorted)
  }

  test("offset stability: a late file that sorts lexically FIRST does not shift consumed offsets") {
    val dir = Files.createTempDirectory("mq-late").toString
    writeQueueFile(dir, "m-middle.jsonl", (0 until 6).map(msg))
    val ckpt = Files.createTempDirectory("mq-late-ckpt").toString
    val out = mutable.ArrayBuffer.empty[String]
    def drain(): Unit = {
      val q = readQueue(dir).writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], _: Long) =>
          out.synchronized { out ++= b.collect().map(_.getString(2)) }; ()
        }.start()
      q.awaitTermination()
    }
    drain()
    assert(out.sorted == (0 until 6).map(i => s"batch$i").sorted)
    // arrives AFTER m-middle was consumed but sorts BEFORE it
    writeQueueFile(dir, "a-late.jsonl", (100 until 104).map(msg))
    drain()
    // the 6 consumed messages must NOT re-emit, the 4 late ones all emit
    assert(out.size == 10, s"late-sorting file shifted offsets: $out")
    assert(out.sorted == ((0 until 6) ++ (100 until 104)).map(i => s"batch$i").sorted)
  }

  test("corrupt line surfaces as a null-typed row carrying the raw bytes (DLQ routing, not a poison pill)") {
    val dir = Files.createTempDirectory("mq-corrupt").toString
    writeQueueFile(dir, "good.jsonl", (0 until 3).map(msg))
    Files.write(java.nio.file.Paths.get(dir, "z-bad.jsonl"),
      "{not json at all\n".getBytes("UTF-8"))
    val got = mutable.ArrayBuffer.empty[(Option[String], String)]
    val q = readQueue(dir).writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", Files.createTempDirectory("mq-corrupt-ckpt").toString)
      .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], _: Long) =>
        got.synchronized { got ++= b.collect().map(r =>
          (Option(r.getString(0)), r.getString(3))) }
        ()
      }.start()
    q.awaitTermination()
    assert(got.size == 4)
    val corrupt = got.filter(_._1.isEmpty)
    assert(corrupt.map(_._2) == Seq("{not json at all"))
  }

  test("ProcessingTime tail: files dropped while the query runs are discovered, admitted, and drained in order") {
    val dir = Files.createTempDirectory("mq-tail").toString
    writeQueueFile(dir, "w0.jsonl", (0 until 4).map(msg))
    val got = mutable.ArrayBuffer.empty[String]
    val q = readQueue(dir, maxPerTrigger = Some(3))
      .writeStream
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .option("checkpointLocation", Files.createTempDirectory("mq-tail-ckpt").toString)
      .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], _: Long) =>
        got.synchronized { got ++= b.collect().map(_.getString(2)) }; ()
      }.start()
    try {
      val deadline0 = System.currentTimeMillis() + 30000
      while (got.synchronized(got.size) < 4 && System.currentTimeMillis() < deadline0)
        Thread.sleep(50)
      assert(got.synchronized(got.toList).sorted == (0 until 4).map(i => s"batch$i").sorted)
      // live drop while the query is running
      writeQueueFile(dir, "w1.jsonl", (10 until 17).map(msg))
      val deadline1 = System.currentTimeMillis() + 30000
      while (got.synchronized(got.size) < 11 && System.currentTimeMillis() < deadline1)
        Thread.sleep(50)
      assert(got.synchronized(got.toList).sorted ==
        ((0 until 4) ++ (10 until 17)).map(i => s"batch$i").sorted,
        s"tail missed or duplicated live-dropped messages: $got")
    } finally q.stop()
  }

  test("the DSv2 drain equals MessageStream's file-drop drain on an exported message plane") {
    // same import, two source implementations — the v2 row twin's contract
    val dir = Files.createTempDirectory("mq-twin").toString
    val msgs = (0 until 40).map(msg)
    writeQueueFile(dir, "q0.jsonl", msgs.take(20))
    writeQueueFile(dir, "q1.jsonl", msgs.drop(20))
    val viaV2 = mutable.ArrayBuffer.empty[CatalogMessage]
    val q = readQueue(dir, maxPerTrigger = Some(16)).as[CatalogMessage]
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", Files.createTempDirectory("mq-twin-ckpt").toString)
      .foreachBatch { (b: Dataset[CatalogMessage], _: Long) =>
        viaV2.synchronized { viaV2 ++= b.collect() }; ()
      }.start()
    q.awaitTermination()
    val viaFileDrop = spark.read.schema(Codecs.messageEncoder.schema).json(dir)
      .as[CatalogMessage].collect()
    assert(viaV2.map(_.exportBatchId).sorted == viaFileDrop.map(_.exportBatchId).sorted.toSeq)
    assert(viaV2.toSet == viaFileDrop.toSet)
  }

  test("sync points: slices deep in one large file seek instead of re-scanning, CRLF + blank lines exact") {
    // One 10k-message file (> 2 × SyncEvery=4096) with CRLF endings and
    // interleaved blank lines — the byte-offset sync math must survive both.
    // maxOffsetsPerTrigger=3000 slices it at rows 3000/6000/9000, so batches
    // 2 and 3 start inside sync blocks 1 and 2 and exercise the seek path.
    val dir = Files.createTempDirectory("mq-sync").toString
    val lines = (0 until 10000).flatMap { i =>
      val m = msg(i)
      val l = s"""{"messageType":"${m.messageType}","sourceCatalogId":"${m.sourceCatalogId}",""" +
        s""""exportBatchId":"${m.exportBatchId}","payload":${ujsonEscape(m.payload)}}"""
      if (i % 97 == 0) Seq("", l) else Seq(l) // blank lines must not shift rows
    }
    Files.write(java.nio.file.Paths.get(dir, "big.jsonl"),
      lines.mkString("", "\r\n", "\r\n").getBytes("UTF-8"))
    val ckpt = Files.createTempDirectory("mq-sync-ckpt").toString
    val seen = mutable.ArrayBuffer.empty[String]
    val q = readQueue(dir, maxPerTrigger = Some(3000))
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], _: Long) =>
        seen.synchronized { seen ++= b.collect().map(_.getString(2)) }; ()
      }.start()
    q.awaitTermination()
    assert(seen.size == 10000, s"lost/duplicated rows across sync-seek slices: ${seen.size}")
    assert(seen.sorted == (0 until 10000).map(i => s"batch$i").sorted)
    // the persisted log carries the sync points, and each one is an exact
    // line start (the seek contract): the byte at that offset opens a JSON line
    val log = new String(Files.readAllBytes(
      java.nio.file.Paths.get(ckpt, "sources", "0", "graft-queue-files.log")), "UTF-8")
    val fields = log.trim.split('\t')
    assert(fields.length == 3 && fields(2).nonEmpty, s"log missing sync points: $log")
    val syncs = fields(2).split(',').map(_.toLong)
    assert(syncs.length == 2, s"10k rows / 4096 => 2 sync points, got ${syncs.toSeq}")
    val raw = Files.readAllBytes(java.nio.file.Paths.get(dir, "big.jsonl"))
    syncs.foreach(o => assert(raw(o.toInt) == '{',
      s"sync $o is not a line start: byte=${raw(o.toInt).toChar}"))
  }

  test("a pre-sync-era log (count<TAB>path, no sync field) still reads — seek falls back to byte 0") {
    val dir = Files.createTempDirectory("mq-oldlog").toString
    writeQueueFile(dir, "f0.jsonl", (0 until 10).map(msg))
    val ckpt = Files.createTempDirectory("mq-oldlog-ckpt").toString
    // pre-seed the source's private state dir with an old-generation log
    val srcDir = java.nio.file.Paths.get(ckpt, "sources", "0")
    Files.createDirectories(srcDir)
    Files.write(srcDir.resolve("graft-queue-files.log"),
      s"10\tfile:${new java.io.File(dir, "f0.jsonl").getAbsolutePath}\n".getBytes("UTF-8"))
    val seen = mutable.ArrayBuffer.empty[String]
    val q = readQueue(dir, maxPerTrigger = Some(4))
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], _: Long) =>
        seen.synchronized { seen ++= b.collect().map(_.getString(2)) }; ()
      }.start()
    q.awaitTermination()
    assert(seen.sorted == (0 until 10).map(i => s"batch$i").sorted,
      s"old-format log broke the read path: $seen")
  }
}
