package graft.run

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * sf1 FULL-SURFACE VERIFICATION (round-10 verdict item #5, extending the
 * round-9 headroom smoke): materialize a ~10× replica of the sf0.1 fixtures
 * (≈6M lineitems / 1.5M orders / 500k documents / 200k embeddings — the sf1
 * scale step) and run the COMPLETE adapted TPC-H suite plus the dedup and
 * ANN/text families against it — timing each row AND dumping its result +
 * oracle SQL so `tools/sf1_gate.py` can run the DuckDB compare at sf1.
 * This converts "the plans would hold at scale" from argument to artifact:
 * per-query pass + time + ratio-vs-sf0.1, recorded in SF1_SMOKE.json.
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
 * Usage: Sf1Smoke [src] [replicas] [dumpDir] [only,names]. With a dumpDir,
 * every selected query's result is written to dumpDir/<name>/ plus
 * oracle_sql.json / declared_queries.json / sf1_times.json / sf1_dir.txt —
 * the same layout graft.Verify produces, so the oracle tooling applies
 * unchanged. Without one, it behaves as the original timed smoke.
 */
object Sf1Smoke {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val replicas = args.lift(1).map(_.toInt).getOrElse(10)
    val dumpDir = args.lift(2)
    // Loadavg precondition (r15 verdict #8): a contended first run produces
    // absurd superlinear flags that cost a re-run to disprove. Wait for the
    // 1-min load to settle; refuse after 30 min so a stuck box fails loudly.
    val maxLoad = sys.env.getOrElse("GRAFT_MAX_LOAD", "1.0").toDouble
    def load1(): Double =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.split("\\s+")(0).toDouble
      catch { case _: Throwable => 0.0 }
    var waited = 0
    while (load1() >= maxLoad && waited < 1800) {
      System.err.println(s"[sf1] waiting: loadavg ${load1()} >= $maxLoad (${waited}s)")
      Thread.sleep(30000); waited += 30
    }
    val loadBefore = load1()
    if (loadBefore >= maxLoad) {
      System.err.println(s"[sf1] REFUSED: loadavg $loadBefore >= $maxLoad after 30 min")
      sys.exit(2)
    }
    System.err.println(s"[sf1] loadavg_before: $loadBefore")
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

    // Full surface when dumping for the oracle gate; the original headline
    // five for the bare smoke. Streaming rows (s7/s8) stay out — their cost
    // is the documented per-batch state floor, not a scale question, and
    // the full-surface run is a batch-plan artifact.
    // optional 4th arg: comma-separated query names — reproduce one sf1 row
    // without re-running the whole surface
    val only = args.lift(3).map(_.split(',').toSet)
    val selected = (dumpDir match {
      case Some(_) => graft.SparkEntry.queries.keys
        .filter(n => n.startsWith("q") || n.startsWith("d_") || n.startsWith("e_"))
        .toList.sorted
      case None => List("q1_pricing_summary", "q18_big_orders",
        "d_minhash_pairs", "d_segment_dedup", "e_knn_join")
    }).filter(n => only.forall(_.contains(n)))
    dumpDir.foreach(d => new java.io.File(d).mkdirs())

    val results = scala.collection.mutable.LinkedHashMap.empty[String, (Double, Long)]
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    selected.foreach { name =>
      // two repeats, min — enough for a headroom artifact (the per-round
      // bench at sf0.1 is the calibrated one; this run answers: does the
      // plan survive 10× without a cliff, and is the answer still right)
      try {
        var best = Double.MaxValue
        (1 to 2).foreach { _ =>
          val q0 = System.nanoTime()
          graft.SparkEntry.queries(name)(spark, out)
            .write.format("noop").mode("overwrite").save()
          best = math.min(best, (System.nanoTime() - q0) / 1e9)
        }
        val rows = dumpDir match {
          case Some(d) =>
            graft.SparkEntry.queries(name)(spark, out).coalesce(1)
              .write.mode("overwrite").parquet(s"$d/$name")
            spark.read.parquet(s"$d/$name").count()
          case None => graft.SparkEntry.queries(name)(spark, out).count()
        }
        results(name) = (best, rows)
        System.err.println(f"""{"sf1_query":"$name","min":$best%.2f,"rows":$rows}""")
      } catch { case e: Throwable =>
        errors(name) = s"${e.getClass.getName}: ${e.getMessage}"
        System.err.println(s"[sf1] $name FAILED: ${e.getMessage}")
      }
      System.err.flush()
      // UNTIMED inter-query hygiene — shared with Bench (r16 fix: dead
      // localCheckpoint/broadcast blocks and loaded streaming state
      // providers otherwise bill rows 1..N−1's garbage to row N; measured
      // at sf1: unchanged d_ngram_jaccard 37.8 s late in the full surface
      // vs 19.7 s isolated). Pressure-gated GC; providers reload lazily.
      BenchHygiene.interQueryCleanup(spark)
    }

    dumpDir.foreach { d =>
      def jq(s: String): String = "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case '\r' => "\\r"; case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
      val oracle = graft.SparkEntry.oracleSql.filter { case (k, _) => results.contains(k) }
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$d/oracle_sql.json"),
        oracle.map { case (k, v) => s"${jq(k)}: ${jq(v)}" }.mkString("{", ",", "}"))
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$d/declared_queries.json"),
        selected.map(jq).mkString("[", ",", "]"))
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$d/verify_errors.json"),
        errors.map { case (k, v) => s"${jq(k)}: ${jq(v)}" }.mkString("{", ",", "}"))
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$d/sf1_times.json"),
        results.map { case (k, (s, r)) => s"${jq(k)}: {\"sec\": ${f"$s%.3f"}, \"rows\": $r}" }
          .mkString("{", ",", "}"))
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$d/sf1_dir.txt"), out)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$d/loadavg_before.txt"), loadBefore.toString)
    }

    val qs = results.map { case (k, (s, r)) =>
      s""""$k":{"sec":${f"$s%.2f"},"rows":$r}""" }.mkString("{", ",", "}")
    println(s"""{"sf1_smoke":1,"source":"$src","replicas":$replicas,"build_sec":${f"$buildSec%.1f"},"n":${results.size},"n_failed":${errors.size},"queries":$qs}""")
    spark.stop()
    if (errors.nonEmpty) {
      System.err.println(s"[sf1] ${errors.size} FAILED: ${errors.keys.mkString(", ")}")
      sys.exit(1)
    }
  }
}
