package graft.run

import org.apache.spark.sql.SparkSession

/** Scratch profiler for s8_stream_import's phases (not part of the suite). */
object S8Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      System.err.println(f"[s8probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import graft.run.ReplicationConfig
    import graft.sources.CatalogSnapshot
    import graft.streaming.MessageStream
    // fixture (untimed in bench)
    val msgDir = timed("fixture export")(graft.SparkEntry.probeS8MsgDir(spark, sfDir))
    // driver-side discovery scan cost (the v2 source counts every file's
    // non-empty lines on the driver at query start)
    val dirSize = new java.io.File(msgDir).listFiles().filter(_.isFile).map(_.length).sum
    System.err.println(f"[s8probe] msgDir bytes: ${dirSize / 1e6}%.1f MB")
    (1 to 2).foreach { i =>
      timed(s"backlogCount driver line-count pass $i") {
        graft.streaming.MessageQueueSource.backlogCount(spark, msgDir)
      }
    }
    (1 to 3).foreach { i =>
      timed(s"run $i TOTAL") {
        val stateDir = java.nio.file.Files.createTempDirectory("s8p-state").toString
        val ckptDir = java.nio.file.Files.createTempDirectory("s8p-ckpt").toString
        val cfg = ReplicationConfig(runId = 500L)
        // batch-mode equivalent of the micro-batch body, phase by phase
        val msgs = timed(s"run $i json read+count") {
          val m = spark.read.schema(graft.codec.Codecs.messageEncoder.schema).json(msgDir)
            .as[graft.model.CatalogMessage](graft.codec.Codecs.messageEncoder)
          m.cache(); m.count(); m
        }
        val plan = timed(s"run $i planImport") {
          val p = ReplicationJob.planImport(spark, msgs, CatalogSnapshot.empty(spark, "tgt"), cfg)
          p.tableActions.write.format("noop").mode("overwrite").save(); p
        }
        msgs.unpersist()
        timed(s"run $i batch body: plan+3 applies+parquet") {
          import graft.operators.Applier
          val stateV0 = java.nio.file.Files.createTempDirectory("s8p-v0").toString
          val tgt0 = CatalogSnapshot.empty(spark, "tgt")
          val p = ReplicationJob.planImport(spark, spark.read
            .schema(graft.codec.Codecs.messageEncoder.schema).json(msgDir)
            .as[graft.model.CatalogMessage](graft.codec.Codecs.messageEncoder), tgt0, cfg)
          Applier.applyDatabases(tgt0.databases, p.dbActions)
            .write.mode("overwrite").parquet(s"$stateV0/databases")
          Applier.applyTables(tgt0.tables, p.tableActions)
            .write.mode("overwrite").parquet(s"$stateV0/tables")
          Applier.applyPartitions(tgt0.partitions, p.partActions)
            .write.mode("overwrite").parquet(s"$stateV0/partitions")
          p.deadLetters.write.mode("append").parquet(s"$stateV0/dead")
        }
        timed(s"run $i trivial streaming drain (count sink)") {
          val ckpt2 = java.nio.file.Files.createTempDirectory("s8p-ckpt2").toString
          val q = spark.readStream.schema(graft.codec.Codecs.messageEncoder.schema)
            .json(msgDir)
            .writeStream
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .option("checkpointLocation", ckpt2)
            .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
              b.write.format("noop").mode("overwrite").save(); ()
            }
            .start()
          q.awaitTermination()
        }
        timed(s"run $i trivial QUEUE-source drain (count sink)") {
          // same trivial body as above, but through the DSv2 graft-queue
          // connector — isolates the v2 source tax (driver-side discovery
          // line count + per-line parse) from the import fold
          val ckpt3 = java.nio.file.Files.createTempDirectory("s8p-ckpt3").toString
          val cap = graft.streaming.MessageQueueSource.backlogCount(spark, msgDir)
          val q = MessageStream.readMessagesQueue(spark, msgDir, Some(math.max(1L, cap)))
            .writeStream
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .option("checkpointLocation", ckpt3)
            .foreachBatch { (b: org.apache.spark.sql.Dataset[graft.model.CatalogMessage], id: Long) =>
              b.write.format("noop").mode("overwrite").save(); ()
            }
            .start()
          q.awaitTermination()
        }
        timed(s"run $i streaming drain e2e") {
          val tgt = MessageStream.runImport(spark, msgDir, stateDir, ckptDir,
            CatalogSnapshot.empty(spark, "tgt"), cfg)
          tgt.tables.write.format("noop").mode("overwrite").save()
        }
        timed(s"run $i streaming drain e2e QUEUE (v2 shape)") {
          val stateDir2 = java.nio.file.Files.createTempDirectory("s8p-state2").toString
          val ckptDir2 = java.nio.file.Files.createTempDirectory("s8p-ckpt4").toString
          val cap = graft.streaming.MessageQueueSource.backlogCount(spark, msgDir)
          val tgt = MessageStream.runImport(spark, msgDir, stateDir2, ckptDir2,
            CatalogSnapshot.empty(spark, "tgt"), cfg,
            queueMaxMessagesPerTrigger = Some(math.max(1L, cap)))
          tgt.tables.write.format("noop").mode("overwrite").save()
        }
      }
    }
    spark.stop()
  }
}
