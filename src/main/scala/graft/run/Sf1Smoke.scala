package graft.run

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * sf1 HEADROOM SMOKE (round-9 verdict item #7): materialize a ~10× replica
 * of the sf0.1 fixtures (≈6M lineitems / 1.5M orders / 50k documents / 20k
 * embeddings — the sf1 scale step) and run the headline rows against it,
 * proving the plans hold through a 10× data step with no new spill/skew
 * surprises — the same plans that run at sf0.1 in the round bench.
 *
 * Scaling is deterministic and JOIN-PRESERVING:
 *  - orders/lineitem replicate with an orderkey offset per replica
 *    (customers stay fixed, so each customer simply owns 10× orders — the
 *    realistic growth axis, and the q18 join keys stay valid);
 *  - documents replicate with a doc_id offset and a per-replica token
 *    appended to the text, so replicas are NEAR-duplicates (fingerprints
 *    differ, minhash buckets still collide) — the dedup rows run against a
 *    genuinely near-dup-heavy corpus instead of 10× byte-identical copies;
 *  - embeddings replicate with a vec_id offset and a deterministic sub-1e-3
 *    per-replica perturbation, so ANN candidates spread instead of
 *    producing 10-way exact ties.
 *
 * Prints one `{"sf1_smoke":…}` JSON line (plus streamed per-query lines);
 * the recorded artifact lives at SF1_SMOKE.json in the repo.
 */
object Sf1Smoke {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val replicas = args.lift(1).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = java.nio.file.Files.createTempDirectory("graft-sf1").toString
    System.err.println(s"[sf1] materializing ${replicas}x of $src under $out")

    def t(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    def reps: DataFrame = spark.range(replicas).select(col("id").cast("int").as("rep"))
    def save(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")

    val t0 = System.nanoTime()
    // join-preserving key offsets; small dims copy through unchanged
    Seq("region", "nation", "customer", "supplier", "part", "events")
      .foreach(n => save(t(n), n))
    val keyStep = 1L << 32 // far above any fixture key: replicas never collide
    save(t("orders").crossJoin(reps)
      .withColumn("o_orderkey", col("o_orderkey") + col("rep") * keyStep)
      .drop("rep"), "orders")
    save(t("lineitem").crossJoin(reps)
      .withColumn("l_orderkey", col("l_orderkey") + col("rep") * keyStep)
      .drop("rep"), "lineitem")
    save(t("documents").crossJoin(reps)
      .withColumn("doc_id", col("doc_id") + col("rep") * keyStep)
      .withColumn("text", concat(col("text"), lit(" rep"), col("rep")))
      .drop("rep"), "documents")
    save(t("embeddings").crossJoin(reps)
      .withColumn("vec_id", col("vec_id") + col("rep") * keyStep)
      .withColumn("embedding",
        transform(col("embedding"),
          (x, i) => x + (col("rep") % 7 - lit(3)) * (i % 5 - lit(2)) * lit(1e-4f))
        .cast("array<float>"))
      .drop("rep"), "embeddings")
    val buildSec = (System.nanoTime() - t0) / 1e9
    System.err.println(f"[sf1] materialized in $buildSec%.1f s")

    val headline = Seq("q1_pricing_summary", "q18_big_orders",
      "d_minhash_pairs", "d_segment_dedup", "e_knn_join")
    val results = scala.collection.mutable.LinkedHashMap.empty[String, (Double, Long)]
    headline.foreach { name =>
      // two repeats, min — enough for a headroom smoke (the per-round bench
      // at sf0.1 is the calibrated artifact; this run answers one question:
      // does the plan survive 10× without a cliff)
      var best = Double.MaxValue
      var rows = 0L
      (1 to 2).foreach { _ =>
        val q0 = System.nanoTime()
        val df = graft.SparkEntry.queries(name)(spark, out)
        df.write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - q0) / 1e9
        if (sec < best) best = sec
        rows = df.count()
      }
      results(name) = (best, rows)
      System.err.println(f"""{"sf1_query":"$name","min":$best%.2f,"rows":$rows}""")
    }
    val qs = results.map { case (k, (s, r)) =>
      s""""$k":{"sec":${f"$s%.2f"},"rows":$r}""" }.mkString("{", ",", "}")
    println(s"""{"sf1_smoke":1,"source":"$src","replicas":$replicas,"build_sec":${f"$buildSec%.1f"},"queries":$qs}""")
    spark.stop()
  }
}
