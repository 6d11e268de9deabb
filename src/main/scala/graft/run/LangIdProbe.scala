package graft.run

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Phase-timing probe for the X69 char-n-gram lang-id row (r15 verdict
  * watch #3: the row drifted 0.82→~1.7 s at sf0.1 with no code change in
  * its path). Times each phase separately across repeats so the drift can
  * be attributed to train / collect / classify instead of guessed. */
object LangIdProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.SketchFunctions.register(spark)
    def sec(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    for (rep <- 1 to 3) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("lang"), lower(trim(col("text"))).as("lc"))
      val tok: Column => Column = c => TextFunctions.charNgramsOf(c, 3)
      var model: org.apache.spark.sql.DataFrame = null
      var stats: org.apache.spark.sql.DataFrame = null
      val tTrain = sec {
        val ms = TextFunctions.naiveBayesTrain(
          docs.where(col("doc_id") % 5 === 0), "lang", textCol = "lc",
          tokenizer = tok)
        model = ms._1; stats = ms._2
      }
      var enc: Seq[String] = null
      val tCollect = sec { enc = TextFunctions.collectNbModel(model, stats) }
      var encF: Seq[String] = null
      val tFused = sec {
        encF = TextFunctions.collectNbModelFused(
          docs.where(col("doc_id") % 5 === 0), "lang", textCol = "lc",
          tokenizer = tok)
      }
      require(encF.toSet == enc.toSet, "fused model must equal the slow path")
      val tCounts = sec {
        docs.where(col("doc_id") % 5 === 0)
          .select(col("lang").as("label"),
            explode(tok(col("lc"))).as("token"))
          .where(col("token") =!= "")
          .groupBy(col("label"), col("token"))
          .agg(count(lit(1)).as("cnt")).collect()
      }
      println(f"[langid] fused=$tFused%.2f countsOnly=$tCounts%.2f")
      val tClassify = sec {
        docs.select(col("doc_id"), TextFunctions.nbArgmax(col("lc"), enc).as("p"))
          .select(col("doc_id"), col("p.label"), col("p.score"))
          .write.mode("overwrite").format("noop").save()
      }
      println(f"[langid] rep=$rep train=$tTrain%.2f collect=$tCollect%.2f " +
        f"classify=$tClassify%.2f model_rows=${enc.length}")
    }
    spark.stop()
  }
}
