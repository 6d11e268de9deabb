package graft

import org.apache.spark.sql.functions._

/**
 * X103 leakage-safe train/eval split: differential verification against a
 * brute-force all-pairs reference — the excised set must be EXACTLY the set
 * of train-side docs with a ≥0.8 exact trigram-Jaccard partner in eval, the
 * eval set must be exactly the md5 hash rule, and planted cross-split twins
 * must be excised. Runs the shipped SparkEntry query on the sf0.001 fixture
 * so the reference covers the real planted corpus, not a toy one.
 */
class LeakageSplitSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def grams(text: String): Set[String] = {
    val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (toks.length < 3) Set.empty
    else toks.sliding(3).map(_.mkString(" ")).toSet
  }

  private def jaccard(a: Set[String], b: Set[String]): Double =
    if (a.isEmpty || b.isEmpty) 0.0
    else {
      val i = (a & b).size
      i.toDouble / (a.size + b.size - i)
    }

  private def md5Eval(id: Long): Boolean = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("US-ASCII"))
    val hex = f"${d(0) & 0xff}%02x"
    hex < "19"
  }

  // the same corpus construction the query plants: base (n_chars < 300)
  // plus +70M one-token-appended twins of every doc_id % 5 == 4 doc
  private lazy val corpus: Map[Long, String] = {
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .where(col("n_chars") < 300)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toMap
    base ++ base.collect { case (id, text) if id % 5 == 4 =>
      (id + 70000000L, text + " graftleakdup")
    }
  }

  private lazy val result: Map[Long, String] =
    SparkEntry.queries("d_leakage_split")(spark, dir)
      .as[(Long, String)].collect().toMap

  test("eval membership is exactly the deterministic md5 hash rule") {
    assert(result.keySet == corpus.keySet, "every corpus doc gets a label")
    corpus.keys.foreach { id =>
      assert((result(id) == "eval") == md5Eval(id),
        s"doc $id: label ${result(id)} vs md5Eval=${md5Eval(id)}")
    }
  }

  test("excised = exactly the train docs with a >=0.8 eval near-dup (all-pairs reference)") {
    val gmap = corpus.map { case (id, t) => id -> grams(t) }
    val evalIds = corpus.keys.filter(md5Eval).toSet
    val trainIds = corpus.keySet -- evalIds
    val wantExcised = trainIds.filter { t =>
      gmap(t).nonEmpty && evalIds.exists(e => jaccard(gmap(t), gmap(e)) >= 0.8)
    }
    val gotExcised = result.collect { case (id, "excised") => id }.toSet
    assert(gotExcised == wantExcised,
      s"excised mismatch: missing=${(wantExcised -- gotExcised).take(5)}, " +
        s"extra=${(gotExcised -- wantExcised).take(5)}")
    // the reference must be non-trivial: the plant guarantees leakers exist
    assert(wantExcised.nonEmpty, "fixture must contain cross-split leakage")
    // and no eval doc is ever excised (excision is a train-side verdict)
    result.foreach { case (id, s) =>
      if (evalIds(id)) assert(s == "eval", s"eval doc $id labeled $s")
    }
  }

  test("planted cross-split twins are excised whenever they actually leak") {
    val gmap = corpus.map { case (id, t) => id -> grams(t) }
    var straddling = 0
    corpus.keys.filter(id => id >= 70000000L).foreach { twin =>
      val orig = twin - 70000000L
      val j = jaccard(gmap(twin), gmap(orig))
      (md5Eval(twin), md5Eval(orig)) match {
        case (false, true) if j >= 0.8 => // twin in train, original in eval
          straddling += 1
          assert(result(twin) == "excised", s"twin $twin must be excised (j=$j)")
        case (true, false) if j >= 0.8 => // original in train, twin in eval
          straddling += 1
          assert(result(orig) == "excised", s"original $orig must be excised (j=$j)")
        case _ => ()
      }
    }
    assert(straddling > 0, "the plant must produce at least one straddling pair")
  }
}
