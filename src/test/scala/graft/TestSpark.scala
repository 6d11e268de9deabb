package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One SparkSession per test JVM (sbt forks a single JVM for the whole test
  * run). local[4] + 4 shuffle partitions keeps specs fast; production sizing
  * is the caller's concern (Bench/Verify set 32). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.plans.VectorFunctions.register(s)
    graft.plans.SketchFunctions.register(s)
    s
  }
}

trait SparkSpec extends AnyFunSuite {
  val spark: SparkSession = TestSpark.spark
}
