package graft.run

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Scale smoke for the training-data operators: the oracle corpus is 500
 * docs, which verifies semantics but says nothing about the 100× question —
 * this main inflates it to 1M documents (2000 deterministic replicas, each
 * perturbed per-replica so content is unique EXCEPT planted cross-replica
 * duplicates) and drives the headline operators end-to-end, printing wall
 * seconds per stage:
 *
 *  - exact dedup: every replica-0 doc duplicated once at replica 1000 →
 *    dedup must remove exactly 500 rows of 1,000,500;
 *  - segment dedup: the injected per-replica prefix is boilerplate repeated
 *    1M times — the hot-key case the groupBy-min winner plan exists for;
 *  - heavy hitters: exact top-20 over ~50M tokens via the Misra–Gries
 *    candidate pass;
 *  - MinHash signatures + banding over the full 1M (the sketch plane cost,
 *    bucket-capped pair surface).
 *
 * Run: `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.run.CorpusScaleSmoke"`
 * (defaults to sf0.01). Numbers recorded in SURVEY §2 X-table notes.
 */
object CorpusScaleSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val replicas = sys.env.getOrElse("SPARK_GRAFT_SMOKE_REPLICAS", "2000").toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[corpus-smoke] $name%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val nBase = base.count()

    // Deterministic inflation: doc (id, r) gets a per-(id, r) token prefix so
    // replicas are distinct content — EXCEPT replica 1000, which replays
    // replica 0's text verbatim (the planted cross-replica duplicates).
    // A shared "boilerplate" head segment (10 tokens, identical everywhere)
    // makes every doc open with the same hot segment.
    val boiler = (1 to 10).map(i => s"bp$i").mkString(" ")
    val corpus = base
      .crossJoin(spark.range(replicas).select(col("id").as("r")))
      .select(
        (col("doc_id") * replicas + col("r")).as("doc_id"),
        concat(
          lit(boiler), lit(" "),
          when(col("r") === 1000, concat(lit("u0 "), col("text")))
            .otherwise(concat(concat(lit("u"), col("r")), lit(" "), col("text"))))
          .as("text"))
      .repartition(64)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = timed("inflate")(corpus.count())
    println(s"[corpus-smoke] corpus rows: $n (base $nBase x $replicas)")

    val survivors = timed("exact-dedup") {
      graft.functions.Dedup.exactDedup(corpus).count()
    }
    // replica 1000 replays replica 0 verbatim -> exactly nBase rows vanish
    assert(survivors == n - nBase, s"expected ${n - nBase} survivors, got $survivors")

    val segStats = timed("segment-dedup") {
      graft.functions.Dedup.segmentDedup(corpus)
        .agg(sum("n_kept").cast("long"), sum("n_dropped").cast("long"))
        .head()
    }
    val dropped = segStats.getLong(1)
    // the boilerplate head alone is ~1M drops (kept once globally)
    assert(dropped >= n - 1, s"boilerplate should drop >= ${n - 1}, got $dropped")
    println(s"[corpus-smoke] segments kept=${segStats.getLong(0)} dropped=$dropped")

    val top = timed("heavy-hitters") {
      graft.functions.TextFunctions.heavyHitterTokens(corpus, m = 20, k = 1024)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    }
    val naive = timed("hh-naive-truth") {
      corpus.select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token")).limit(20)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    }
    assert(top == naive, s"MG top-20 diverged from the exact truth:\n$top\nvs\n$naive")

    val pairSurface = timed("minhash-bands") {
      // signature + banding plane over the full corpus (the scan-heavy cost);
      // bucket-capped candidate surface, counted not materialized
      graft.functions.Dedup.minhashPairs(corpus, threshold = 0.9).count()
    }
    println(s"[corpus-smoke] minhash pair surface: $pairSurface")

    // BPE tokenization throughput (X44): the hot loop of every real data
    // pipeline — one codegen'd projection over the corpus, merge table as a
    // reference object, per-task word memo. Reported as tokens/sec.
    graft.plans.SketchFunctions.register(spark)
    val bpeTokens = timed("bpe-encode") {
      corpus.select(graft.functions.TextFunctions.bpeTokenCount(
          col("text"), graft.functions.TextFunctions.BpeSeedMerges).as("n"))
        .agg(sum(col("n"))).head().getLong(0)
    }
    println(s"[corpus-smoke] bpe tokens: $bpeTokens over $n docs")
    assert(bpeTokens > n, "BPE must emit more tokens than documents")

    // Keyword tagging throughput (X59): a 512-phrase dictionary in ONE
    // Aho–Corasick pass per row — the per-row cost must not scale with the
    // dictionary (the contains-per-term plan would be 512 scans). Dict =
    // 500 synthetic misses + planted hits so the automaton walks real text.
    val dict = (1 to 500).map(i => s"zq$i xx") ++
      Seq("bp1 bp2", "bp9 bp10", "batch small", "stream join", "customer",
        "merge", "vector", "hash scan", "scan", "dup", "u1000", "zzz end")
    val tagged = timed("keyword-tags") {
      corpus.select(size(graft.functions.TextFunctions.keywordHits(
          col("text"), dict)).as("k"))
        .agg(sum(col("k")).cast("long"), count(lit(1))).head()
    }
    println(s"[corpus-smoke] keyword hits: ${tagged.getLong(0)} over ${tagged.getLong(1)} docs, dict=${dict.size}")
    // every doc opens with the boilerplate head -> "bp1 bp2" hits all rows
    assert(tagged.getLong(0) >= n, "boilerplate dictionary phrase must hit every doc")
    corpus.unpersist()
    println("[corpus-smoke] PASS")
    spark.stop()
  }
}
