package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.plans.AhoCorasick

/**
 * X59 Aho–Corasick keyword tagging: one pass over the text must equal a
 * contains-scan per term — including the classic overlap/nesting traps
 * (suffix matches reached only through fail links, terms nested inside
 * longer terms, matches ending at the same position).
 */
class KeywordHitsSpec extends SparkSpec {
  import spark.implicits._

  private val classicDict = Seq("he", "she", "his", "hers")

  test("automaton equals contains-per-term on the classic he/she/his/hers trap") {
    val auto = new AhoCorasick.Automaton(classicDict.sorted.toArray)
    val sorted = classicDict.sorted.toArray
    val texts = Seq("ushers", "she", "his hers", "h", "", "hehehe", "shis",
      "ahishers", "xxsheyy his")
    texts.foreach { t =>
      val got = auto.matchDistinct(t).map(sorted).toSet
      val want = classicDict.filter(t.contains(_)).toSet
      assert(got == want, s"text '$t': got $got want $want")
    }
  }

  test("expression equals contains-per-term over a random-ish corpus, case-insensitive") {
    graft.plans.SketchFunctions.register(spark)
    val dict = Seq("ab", "babc", "bca", "c", "caa")
    val alpha = "abc"
    val rows = (0 until 300).map { i =>
      val len = 1 + i % 9
      val s = (0 until len).map(j => alpha((i * 31 + j * 7) % 3)).mkString
      (i.toLong, if (i % 5 == 0) s.toUpperCase else s)
    }
    val got = rows.toDF("id", "text")
      .select(col("id"), TextFunctions.keywordHits(col("text"), dict).as("hits"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    rows.foreach { case (id, t) =>
      val want = dict.map(_.toLowerCase).distinct.sorted
        .filter(t.toLowerCase.contains(_))
      assert(got(id) == want, s"id $id text '$t': got ${got(id)} want $want")
    }
  }

  test("output is sorted distinct terms even when the dictionary repeats and mixes case") {
    graft.plans.SketchFunctions.register(spark)
    val df = Seq((1L, "Stream JOIN batch")).toDF("id", "text")
    val hits = df.select(TextFunctions.keywordHits(col("text"),
        Seq("JOIN", "join", "stream join", "batch")).as("h"))
      .collect()(0).getSeq[String](0)
    assert(hits == Seq("batch", "join", "stream join"))
  }

  test("keyword_hits rides WholeStageCodegen with the automaton as a reference object") {
    graft.plans.SketchFunctions.register(spark)
    val dict = (0 until 200).map(i => s"term$i word$i")  // a real dictionary
    val df = spark.range(10).select(concat(lit("term5 word5 text "), col("id")).as("text"))
      .select(TextFunctions.keywordHits(col("text"), dict).as("h"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("keyword_hits"), plan.take(2000))
    assert(plan.contains("*("), s"keyword_hits fell out of codegen:\n${plan.take(2000)}")
    // dictionary rides as a reference object: no 200-term literal blowup
    assert(plan.length < 10000, s"plan blew up to ${plan.length} chars — literals leaked")
    assert(df.collect()(0).getSeq[String](0) == Seq("term5 word5"))
  }
}
