package graft.run

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Scale smoke for the similarity operators: the oracle corpus is 500–2000
 * vectors, which verifies semantics but not the 100× question — this main
 * synthesizes 1M deterministic dim-64 vectors (xxhash64-derived, no RNG) and
 * drives the ANN planes end-to-end, printing wall seconds per stage:
 *
 *  - pq-encode: the ingest-time codes plane over the full corpus — 1M × 8
 *    bytes replaces 1M × 256 bytes on every subsequent ANN scan;
 *  - brute-force top-10: the exact one-scan baseline (native fused cosine
 *    into TakeOrderedAndProject);
 *  - pq top-10: ADC scan over the codes + exact re-rank of the 256-candidate
 *    shortlist; recall vs the exact answer is printed and sanity-bounded
 *    (uniform random vectors are ADC's worst case — near-tied cosines —
 *    so this bounds the floor, not the typical);
 *  - knn-join: 32 probes × 1M corpus in one scan (WindowGroupLimit partial
 *    top-k before the exchange).
 *
 * Run: `sbt "runMain graft.run.VectorScaleSmoke"`. Numbers recorded in
 * SURVEY §2 X-table notes.
 */
object VectorScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_SMOKE_VECTORS", "1000000").toLong
    val dim = 64
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.VectorFunctions.register(spark)

    def timed[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[vector-smoke] $name%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // Deterministic synthetic corpus: element d of vector i derives from
    // xxhash64(i, d) normalized to [-1, 1] — codegen'd builtins, no RNG.
    val corpus = spark.range(n).select(
        col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          d => (xxhash64(col("id"), d).cast("double") / lit(9.223372036854776e18)).cast("float"))
          .as("embedding"))
      .repartition(64)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("materialize")(corpus.count())

    val books = timed("pq-train") {
      graft.functions.Similarity.pqCodebooks(corpus, dim, nSub = 8, k = 16)
    }
    timed("pq-encode") {
      // the ingest-time codes plane: evaluate every code (checksum forces it)
      graft.functions.Similarity.withPqCodes(corpus, books)
        .select(sum(element_at(col("pq"), 1).cast("long"))).head()
    }

    val q = corpus.where(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)
    val exact = timed("brute-force-top10") {
      graft.functions.Similarity.bruteForceTopK(
          corpus.where(col("vec_id") =!= 0), q, k = 10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
    }
    val pq = timed("pq-top10") {
      graft.functions.Similarity.pqTopK(corpus.where(col("vec_id") =!= 0), q,
          k = 10, dim = dim, nSub = 8, codebookSize = 16, shortlist = 256,
          books = Some(books))
        .select("vec_id").collect().map(_.getLong(0)).toSet
    }
    val recall = (exact intersect pq).size
    println(s"[vector-smoke] pq recall@10 vs exact: $recall/10")
    assert(recall >= 5, s"ADC+re-rank recall collapsed: $recall/10")

    timed("knn-join-32q") {
      graft.functions.Similarity.knnJoin(
        corpus, corpus.where(col("vec_id") < 32), k = 5).count()
    }
    corpus.unpersist()
    println("[vector-smoke] PASS")
    spark.stop()
  }
}
