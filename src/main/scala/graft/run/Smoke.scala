package graft.run

import org.apache.spark.sql.SparkSession

/** Local analog of the driver's smoke check: run SparkEntry.entry on sf0.001
  * and print the row count (must be > 0). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    df.groupBy("entityKind", "action").count().show(20, truncate = false)
    println(s"[smoke] entry rows=$n")
    spark.stop()
  }
}
