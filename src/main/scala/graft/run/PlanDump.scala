package graft.run

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Optimization-round plan capture: writes `.explain("formatted")` output for
  * the named SparkEntry queries to `<outDir>/<query>_<tag>.txt` so before /
  * after plan claims in OPTIMIZATION_r<k>.md are checkable without running
  * Spark. Usage:
  *
  *   sbt "runMain graft.run.PlanDump <sfDir> <outDir> <tag> q1,q2,..."
  *
  * Pass `all` as the query list to dump every declared query. Explain only
  * PLANS the query (no execution), so this is cheap; queries whose builder
  * functions synthesize fixture side-dirs still pay that synthesis once.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, tag, qlist) = args.take(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val names: Seq[String] =
      if (qlist == "all") graft.SparkEntry.queries.keys.toSeq.sorted
      else qlist.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[plandump] unknown query: $name")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            Files.writeString(Paths.get(outDir, s"${name}_$tag.txt"), plan)
            System.err.println(s"[plandump] wrote ${name}_$tag.txt (${plan.length} chars)")
          } catch { case e: Throwable =>
            System.err.println(s"[plandump] $name failed: $e")
          }
      }
    }
    spark.stop()
  }
}
