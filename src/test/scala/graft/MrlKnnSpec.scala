package graft

import org.apache.spark.sql.functions._

/**
 * e_mrl_topk contract: the truncated-prefix (48 of 64 dims) coarse shortlist
 * of 200 must COVER the exact full-dim top-10 on every fixture scale factor
 * — that coverage is what entitles the query to the plain exact-kNN oracle.
 * Runs against the real fixtures so a driver-side regeneration that breaks
 * coverage fails here first, not in the round's correctness sheet.
 */
class MrlKnnSpec extends SparkSpec {

  private val sfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  test("48-dim shortlist(200) covers the exact top-10 on the fixtures") {
    for (dir <- sfDirs) {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val q = e.where(col("vec_id") === 1)
        .select(col("embedding").as("qv"), expr("slice(embedding, 1, 48)").as("qp"))
      val scored = e.where(col("vec_id") =!= 1).crossJoin(broadcast(q))
      val exactTop = scored
        .select(col("vec_id"),
          graft.functions.Similarity.cosine(col("embedding"), col("qv")).as("sim"))
        .orderBy(col("sim").desc, col("vec_id")).limit(10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val shortlist = scored
        .select(col("vec_id"),
          graft.functions.Similarity.cosine(expr("slice(embedding, 1, 48)"), col("qp")).as("coarse"))
        .orderBy(col("coarse").desc, col("vec_id")).limit(200)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(exactTop.subsetOf(shortlist),
        s"$dir: coarse shortlist missed ${exactTop -- shortlist}")
    }
  }

  test("e_mrl_topk equals the exact brute-force top-10") {
    for (dir <- sfDirs) {
      val mrl = SparkEntry.queries("e_mrl_topk")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val q = e.where(col("vec_id") === 1).select(col("embedding").as("qv"))
      val exact = e.where(col("vec_id") =!= 1).crossJoin(broadcast(q))
        .select(col("vec_id"),
          round(graft.functions.Similarity.cosine(col("embedding"), col("qv")), 6).as("sim"))
        .orderBy(col("sim").desc, col("vec_id")).limit(10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(mrl == exact, s"$dir: MRL rerank diverged from exact top-10")
    }
  }
}
