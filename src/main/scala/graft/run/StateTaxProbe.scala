package graft.run

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the stateful-streaming fixed cost on this image: a minimal
  * digest-keyed `dropDuplicates` drain (same state shape as the s8 dedup)
  * over a ~600-row file source, timed at {8, 32} state partitions ×
  * {checksum checkpoint manager on, off}. Every micro-batch opens and
  * commits one HDFS-backed state-store provider PER shuffle partition, so a
  * short drain's wall time is dominated by `providers × per-provider init`,
  * not by data. Spark 4.1 wraps checkpoint files in
  * ChecksumCheckpointFileManager (`spark.sql.streaming.checkpoint.
  * fileChecksum.enabled`, default true) which adds a checksum round-trip to
  * every delta/snapshot file — the probe isolates how much of the tax that
  * config carries vs raw provider count.
  *
  * Run: `sbt "runMain graft.run.StateTaxProbe"` — prints one line per cell;
  * findings recorded in SURVEY §2.7.
  */
object StateTaxProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val srcDir = java.nio.file.Files.createTempDirectory("graft-statetax-src").toString
    (1 to 600).map(i => (i.toLong, s"payload-$i")).toDF("id", "payload")
      .coalesce(1).write.mode("overwrite").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema

    def drain(partitions: Int, checksum: Boolean): Double = {
      spark.conf.set("spark.sql.shuffle.partitions", partitions.toString)
      spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", checksum.toString)
      val t0 = System.nanoTime()
      val q = spark.readStream.schema(schema).parquet(srcDir)
        .withColumn("_digest", sha2(col("payload"), 256))
        .dropDuplicates("_digest")
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft-statetax-ckpt").toString)
        .format("noop")
        .start()
      q.awaitTermination()
      (System.nanoTime() - t0) / 1e9
    }

    // one untimed warmup so codegen/session init isn't charged to the first cell
    drain(partitions = 4, checksum = true)
    for {
      parts <- Seq(8, 32)
      checksum <- Seq(true, false)
    } {
      // min of 2: provider init variance on a busy box is the thing measured,
      // but a single outlier shouldn't define the cell
      val t = math.min(drain(parts, checksum), drain(parts, checksum))
      println(f"[statetax] partitions=$parts%2d checksum=$checksum%-5s wall=$t%.2f s")
    }
    spark.stop()
  }
}
