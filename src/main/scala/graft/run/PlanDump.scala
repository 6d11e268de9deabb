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
  * Pass `all` as the query list to dump every declared query.
  *
  * Many query builders execute eagerly (localCheckpoint'd planes, drained
  * streams), so the FINAL frame's plan is often just `Scan ExistingRDD` —
  * the interesting plans ran inside the builder. A QueryExecutionListener
  * therefore captures EVERY plan executed while the query builds and runs
  * (numbered, in execution order), followed by the final frame's plan; the
  * file carries them all.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    if (args.length < 4) {
      System.err.println(
        "usage: PlanDump <sfDir> <outDir> <tag> <q1,q2,...|all>")
      sys.exit(2)
    }
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
    val captured = new scala.collection.mutable.ArrayBuffer[String]
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        captured.synchronized {
          captured += qe.explainString(org.apache.spark.sql.execution.FormattedMode)
        }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val names: Seq[String] =
      if (qlist == "all") graft.SparkEntry.queries.keys.toSeq.sorted
      else qlist.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[plandump] unknown query: $name")
        case Some(fn) =>
          try {
            captured.synchronized(captured.clear())
            val df = fn(spark, sfDir)
            val finalPlan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            df.write.format("noop").mode("overwrite").save()
            // Drain the listener bus BEFORE snapshotting (r16 ADVICE: a bare
            // sleep is racy — a slow plan delivered after it would be counted
            // under the NEXT query's capture, mislabeling plan evidence).
            // LiveListenerBus.waitUntilEmpty is private[spark], so reflect;
            // keep a short sleep as backstop if the call shape ever changes.
            try {
              val sc = spark.sparkContext
              val busM = sc.getClass.getMethod("listenerBus")
              busM.setAccessible(true)
              val bus = busM.invoke(sc)
              val wait = bus.getClass.getMethod("waitUntilEmpty", java.lang.Long.TYPE)
              wait.setAccessible(true)
              wait.invoke(bus, java.lang.Long.valueOf(30000L))
            } catch { case scala.util.control.NonFatal(_) => Thread.sleep(2000) }
            val inner = captured.synchronized(captured.toList)
            val body = new StringBuilder
            inner.zipWithIndex.foreach { case (p, i) =>
              body ++= s"===== executed plan ${i + 1} of ${inner.length} (builder-internal + final action, execution order) =====\n"
              body ++= p
              body ++= "\n"
            }
            body ++= "===== final frame plan (as returned by the query fn) =====\n"
            body ++= finalPlan
            Files.writeString(Paths.get(outDir, s"${name}_$tag.txt"), body.toString)
            System.err.println(s"[plandump] wrote ${name}_$tag.txt (${inner.length + 1} plans, ${body.length} chars)")
          } catch { case e: Throwable =>
            System.err.println(s"[plandump] $name failed: $e")
          }
      }
    }
    spark.stop()
  }
}
