package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Queries are consumed with a `noop`-format write —
  * unlike `.count()`, which lets Catalyst prune the whole select list, noop
  * evaluates every output column, so scan-shaped queries are charged their
  * real cost. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: session init, codegen compiler, parquet reader and the
    // noop sink all spin up here instead of inside the first measured query.
    // The documents/embeddings payload columns are touched once too, so the
    // cold first read (page cache + decompression JIT) isn't charged to
    // whichever corpus query happens to run first in map order.
    try {
      spark.read.parquet(s"$sfDir/nation.parquet")
        .groupBy("n_regionkey").count()
        .write.format("noop").mode("overwrite").save()
      spark.read.parquet(s"$sfDir/documents.parquet")
        .write.format("noop").mode("overwrite").save()
      spark.read.parquet(s"$sfDir/embeddings.parquet")
        .write.format("noop").mode("overwrite").save()
    } catch { case e: Throwable => System.err.println(s"[bench] warmup failed: $e") }
    // Untimed shared-fixture setup (s1 snapshot, side dirs, dlq first pass):
    // measured bodies charge query execution only.
    try SparkEntry.prepare(spark, sfDir)
    catch { case e: Throwable => System.err.println(s"[bench] prepare failed: $e") }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
