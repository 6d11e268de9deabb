package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/**
 * X53 DSIR importance weights / resampling and X54 BM25 retrieval — both
 * must EQUAL a from-scratch Scala reimplementation on any corpus (the
 * brute-twin discipline every pair/score family in this repo follows), and
 * both must plan broadcast-only joins: the corpus-scale stream may shuffle
 * only for its final per-doc / per-(query,doc) aggregate.
 */
class DsirBm25Spec extends SparkSpec {
  import spark.implicits._

  // the shared deterministic 48-bit md5 draw (TextFunctions.hash48)
  private def h48(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(12), 16)
  }

  private def feats(text: String): Seq[String] = {
    val tk = text.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
    tk ++ tk.sliding(2).filter(_.length == 2).map(_.mkString(" "))
  }

  /** Brute DSIR: logw_e8 per raw doc under add-α hashed-bucket models. */
  private def bruteDsir(raw: Seq[(Long, String)], target: Seq[(Long, String)],
      buckets: Int, alpha: Double = 0.5): Map[Long, Long] = {
    def bucketCounts(docs: Seq[(Long, String)]): Map[Long, Long] =
      docs.flatMap { case (_, t) => feats(t).map(f => h48(f) % buckets) }
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ct = bucketCounts(target); val cr = bucketCounts(raw)
    val nT = ct.values.sum.toDouble; val nR = cr.values.sum.toDouble
    val llrE8: Map[Long, Long] = (0L until buckets.toLong).map { b =>
      val v = math.log((ct.getOrElse(b, 0L) + alpha) / (nT + alpha * buckets)) -
        math.log((cr.getOrElse(b, 0L) + alpha) / (nR + alpha * buckets))
      b -> math.round(v * 1e8)
    }.toMap
    raw.map { case (id, t) =>
      id -> feats(t).map(f => llrE8(h48(f) % buckets)).sum
    }.toMap
  }

  private val target = Seq(
    (1L, "fast join hash join fast merge"),
    (2L, "join merge hash fast scan"),
    (3L, "hash join fast merge merge join"))
  private val raw = Seq(
    (10L, "fast join hash merge scan"), // target-like
    (11L, "slow filter window sort order order"), // off-target
    (12L, "join fast merge hash join fast"), // target-like
    (13L, "window sort slow filter customer"), // off-target
    (14L, "fast slow join sort hash window"))

  test("DSIR weights equal the brute hashed-bucket model, exactly") {
    val got = TextFunctions.dsirLogWeights(
        raw.toDF("doc_id", "text"), target.toDF("doc_id", "text"), buckets = 16)
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    val want = bruteDsir(raw, target, buckets = 16)
    assert(got.keySet == raw.map(_._1).toSet)
    raw.foreach { case (id, t) =>
      val (w, n) = got(id)
      assert(n == feats(t).size, s"n_feats of $id")
      assert(w == want(id).toDouble / 1e8, s"logw of $id: got $w want ${want(id) / 1e8}")
    }
  }

  test("DSIR separates target-like from off-target documents") {
    val got = TextFunctions.dsirLogWeights(
        raw.toDF("doc_id", "text"), target.toDF("doc_id", "text"), buckets = 16)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got(10L) > got(11L) && got(12L) > got(13L),
      s"target-vocabulary docs must outscore off-target ones: $got")
  }

  test("DSIR resample: n rows, subset of raw, Gumbel-key order, repartition-invariant") {
    def run(parts: Int) = TextFunctions.dsirResample(
        raw.toDF("doc_id", "text").repartition(parts),
        target.toDF("doc_id", "text"), n = 3, buckets = 16)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val a = run(1); val b = run(7)
    assert(a.toSeq == b.toSeq, "partitioning must not change the draw")
    assert(a.length == 3 && a.map(_._1).toSet.subsetOf(raw.map(_._1).toSet))
    // keys are the brute weights plus the deterministic Gumbel draw
    val want = bruteDsir(raw, target, buckets = 16)
    a.foreach { case (id, _, key) =>
      val u = (h48(id.toString) + 1).toDouble / 281474976710656.0
      val g = math.round(-math.log(-math.log(u)) * 1e8)
      assert(key == (want(id) + g).toDouble / 1e8, s"key of $id")
    }
    assert(a.map(_._3).toSeq == a.map(_._3).sorted.reverse.toSeq, "descending key order")
  }

  test("DSIR plan: broadcast joins only — the corpus never shuffles for a join") {
    val df = TextFunctions.dsirLogWeights(
      raw.toDF("doc_id", "text"), target.toDF("doc_id", "text"), buckets = 16)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), s"corpus-side SMJ in:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"model frame must broadcast in:\n$plan")
    // the raw feature stream must tokenize ONCE: the raw-model aggregate and
    // the scoring pass both hang off the same (doc, bucket) exchange, which
    // AQE must dedup — visible as a ReusedExchange/table-cache reuse, i.e.
    // the executed plan contains fewer word_ngrams scans than consumers
    df.collect() // materialize so AQE finalizes the reuse
    val finalPlan = df.queryExecution.executedPlan.toString
    val rawScans = "bpe_encode|word_ngrams".r // tokenize markers
    assert(finalPlan.contains("ReusedExchange") ||
      rawScans.findAllIn(finalPlan).size <= 2, // one raw + one target pass
      s"raw corpus tokenized more than once in:\n$finalPlan")
  }

  /** Brute BM25 with the operator's quantization (idf 8dp, part 8dp int). */
  private def bruteBm25(docs: Seq[(Long, String)], queries: Seq[(String, String)],
      k1: Double = 1.2, b: Double = 0.75): Map[(String, Long), (Double, Long)] = {
    def toks(t: String) = t.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
    val n = docs.size.toDouble
    val avgdl = docs.map(d => toks(d._2).size).sum.toDouble / docs.size
    val tf = docs.flatMap { case (id, t) =>
      val tk = toks(t)
      tk.groupBy(identity).map { case (w, o) => (id, w, o.size.toDouble, tk.size.toLong) }
    }
    val qt = queries.flatMap { case (qid, q) => toks(q).distinct.map(qid -> _) }
    val qTokens = qt.map(_._2).toSet
    val post = tf.filter(r => qTokens(r._2))
    val df = post.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
    val parts = for {
      (id, w, f, dl) <- post; (qid, t) <- qt if t == w
    } yield {
      val idf = BigDecimal(math.log((n - df(w) + 0.5) / (df(w) + 0.5) + 1.0))
        .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
      val part = idf * f * (k1 + 1.0) / (f + k1 * ((1.0 - b) + b * dl / avgdl))
      ((qid, id), math.round(part * 1e8))
    }
    parts.groupBy(_._1).map { case (key, ps) =>
      key -> ((ps.map(_._2).sum.toDouble / 1e8, ps.size.toLong))
    }
  }

  private val corpus = Seq(
    (1L, "fast join hash join merge"),
    (2L, "slow filter window sort"),
    (3L, "join join join fast"),
    (4L, "merge sort window join filter fast hash scan"),
    (5L, "customer order line"),
    (6L, "order order order line value"))
  private val qs = Seq(("qa", "join fast"), ("qb", "order line missingtoken"))

  test("BM25 equals the brute reimplementation, exactly") {
    val got = TextFunctions.bm25TopK(
        corpus.toDF("doc_id", "text"), qs.toDF("query_id", "query"), k = 10)
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getDouble(2), r.getLong(3)))).toMap
    val want = bruteBm25(corpus, qs)
    assert(got == want, s"got $got\nwant $want")
  }

  test("BM25 top-k caps per query and ranks by score desc, doc_id asc") {
    val rows = TextFunctions.bm25TopK(
        corpus.toDF("doc_id", "text"), qs.toDF("query_id", "query"), k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(4)))
    assert(rows.groupBy(_._1).values.forall(_.length <= 2))
    rows.groupBy(_._1).values.foreach { g =>
      val sorted = g.sortBy(r => (-r._3, r._2))
      assert(g.sortBy(_._4).map(_._2).toSeq == sorted.map(_._2).toSeq)
    }
  }

  test("BM25 plan: query terms broadcast; no corpus-side sort-merge join") {
    val plan = TextFunctions.bm25TopK(
        corpus.toDF("doc_id", "text"), qs.toDF("query_id", "query"), k = 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), s"corpus-side SMJ in:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"terms must broadcast in:\n$plan")
  }
}
