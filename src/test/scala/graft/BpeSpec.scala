package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.plans.BpeOps

/**
 * BPE tokenizer (X44): deterministic training, the seed-table pin that the
 * DuckDB oracles replay as literals, encode∘decode identity, corpus-trained
 * merges via the bounded-pool distributed trainer, and the codegen path.
 */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("training is deterministic and matches the hand model on a tiny vocabulary") {
    // "abab"×3 + "abc"×1: pair counts a-b:7(=2*3+1), b-a:3, b-c:1 → merge (a,b);
    // then ab-ab:3, ab-c:1 → (ab,ab); then (abab? no pair count 0)... walk it:
    val m = BpeOps.train(Seq("abab" -> 3L, "abc" -> 1L), 3)
    assert(m.head == ("a", "b"))
    assert(m(1) == ("ab", "ab"))
    // after (ab,ab): words are [abab], [ab,c] → only pair (ab,c) count 1
    assert(m(2) == ("ab", "c"))
    // determinism across runs and input order
    assert(BpeOps.train(Seq("abc" -> 1L, "abab" -> 3L), 3) == m)
  }

  test("the seed merge table is EXACTLY the 48 pairs the DuckDB oracles embed") {
    // regenerating this table from BpeSeedVocab must reproduce the literals
    // in the d_bpe_encode / d_pack_bpe oracle SQL — training drift fails here
    // before it can silently diverge from the replayed truth
    val expected = Seq(
      ("e","r"),("t","a"),("o","w"),("i","n"),("b","l"),("bl","e"),("ta","ble"),
      ("l","u"),("r","ow"),("s","t"),("a","ta"),("d","ata"),("er","y"),("q","u"),
      ("qu","ery"),("a","lu"),("alu","e"),("v","alue"),("a","t"),("at","c"),
      ("atc","h"),("b","atch"),("d","ow"),("in","dow"),("w","indow"),("a","m"),
      ("e","am"),("r","eam"),("st","ream"),("m","er"),("f","i"),("fi","l"),
      ("fil","t"),("filt","er"),("r","t"),("p","a"),("g","e"),("mer","ge"),
      ("j","o"),("jo","in"),("a","s"),("as","h"),("h","ash"),("a","n"),
      ("c","an"),("s","can"),("o","rt"),("s","ort"))
    assert(TextFunctions.BpeSeedMerges == expected,
      s"seed merges drifted — oracle literals are now stale:\n${TextFunctions.BpeSeedMerges}")
    // the oracle SQL really carries the table (spot-check a mid-table pair)
    val sql = SparkEntry.oracleSql("d_bpe_encode")
    assert(sql.contains("('w' || chr(1) || 'indow')") && sql.contains("('s' || chr(1) || 'ort')"))
  }

  test("encode ∘ decode is the identity: concatenated subwords rebuild every normalized word") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val checked = docs.select(
        trim(lower(col("text"))).as("norm"),
        TextFunctions.bpeEncode(col("text"), TextFunctions.BpeSeedMerges).as("arr"))
      .select(
        regexp_replace(col("norm"), "\\s+", "").as("glued"),
        array_join(col("arr"), "").as("decoded"))
    assert(checked.where(col("glued") =!= col("decoded")).count() === 0)
    assert(checked.count() === 500)
  }

  test("corpus-trained merges (bounded-pool distributed trainer) are deterministic and lossless") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m1 = TextFunctions.bpeTrainOn(docs, numMerges = 32)
    val m2 = TextFunctions.bpeTrainOn(docs, numMerges = 32)
    assert(m1 == m2 && m1.size == 32)
    // fixture-trained table also round-trips the fixture corpus
    val bad = docs.select(
        regexp_replace(trim(lower(col("text"))), "\\s+", "").as("glued"),
        array_join(TextFunctions.bpeEncode(col("text"), m1), "").as("decoded"))
      .where(col("glued") =!= col("decoded")).count()
    assert(bad === 0)
    // and compresses: subword count strictly below character count,
    // at most the whitespace-token count × max word length
    val counts = docs.select(
      sum(TextFunctions.bpeTokenCount(col("text"), m1)).as("bpe"),
      sum(TextFunctions.tokenCount(col("text"))).as("words")).head()
    assert(counts.getLong(0) > counts.getLong(1), "BPE must split some words into pieces")
  }

  test("bpe_encode rides WholeStageCodegen with the merge table as a reference object (no literal blowup)") {
    graft.plans.SketchFunctions.register(spark)
    val docs = spark.range(100).select(col("id").as("doc_id"),
      concat(lit("table row data query value "), col("id")).as("text"))
    val q = docs.select(col("doc_id"),
      TextFunctions.bpeEncode(col("text"), TextFunctions.BpeSeedMerges).as("toks"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"bpe_encode fell out of codegen:\n$plan")
    assert(plan.length < 12000, s"plan blew up to ${plan.length} chars — merge literals leaked")
  }
}
