package graft

import org.apache.spark.sql.SparkSession

/** Deployment-level registration: a plain-SQL session configured with
  * `spark.sql.extensions=graft.plans.GraftExtensions` sees every native
  * expression without any Scala `register()` call. */
class GraftExtensionsSpec extends SparkSpec {

  test("GraftExtensions injects the native functions into a plain-SQL session") {
    val base = spark // force the shared session (and its context) first
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // Reuses base's SparkContext; extensions apply to the NEW session only.
      // (The conf-string route `spark.sql.extensions=graft.plans.
      // GraftExtensions` loads the same class reflectively at context
      // creation — a pre-existing test context can't exercise it, so the
      // builder hook stands in; both call the same apply().)
      val ext = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.plans.GraftExtensions())
        .getOrCreate()
      assert(ext ne base)
      val r = ext.sql(
        """SELECT
           cosine_f32(array(3.0F, 0.0F), array(1.0F, 0.0F)) AS cos,
           dot_f32(array(2.0F, 4.0F), array(1.0F, 0.5F)) AS dot,
           vec_absmax(array(-3.0F, 2.0F)) AS mx,
           quantize_i8(array(1.0F, -0.5F)) AS q8,
           lsh_bucket(array(1.0F, 0.0F), 2, 4, 42L) AS bkt,
           lsh_bands(array(1.0F, 0.0F), 2, 8, 2, 42L) AS bands,
           minhash_sig(array('a b c'), 4) AS sig,
           simhash64(array('a', 'b')) AS sh,
           word_ngrams('a b c d', 2) AS grams,
           min_gram_md5('a b c d', 2) AS mg,
           sig_agreement(array(1L, 2L), array(1L, 3L)) AS agr""").head()
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-9)
      assert(math.abs(r.getDouble(1) - 4.0) < 1e-9)
      assert(r.getDouble(2) == 3.0)
      assert(r.getSeq[Byte](3) == Seq[Byte](127, -64))
      assert(r.getSeq[String](8) == Seq("a b", "b c", "c d"))
      assert(r.getDouble(10) == 0.5)
      // SQL and Column routes resolve to the same constructors: bit-identical
      graft.plans.VectorFunctions.register(base)
      import org.apache.spark.sql.functions.{array, lit}
      val viaColumn = base.range(1).select(
        graft.plans.VectorFunctions.lsh_bands(
          array(lit(1.0f), lit(0.0f)), 2, 8, 2, 42L).as("bands"))
        .head().getSeq[Long](0)
      assert(r.getSeq[Long](5) == viaColumn)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("extension-injected PruneAsOfJoinColumns prunes a WIDE reference behind a join down to the scan") {
    val base = spark
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val ext = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.plans.GraftExtensions())
        .getOrCreate()
      import org.apache.spark.sql.functions._
      val dir = java.nio.file.Files.createTempDirectory("graft-asof-wide").toString
      ext.range(200).select(col("id").as("k"), (col("id") * 3).as("t"),
          col("id").as("payload"),
          concat(lit("wide"), col("id")).as("unused_wide"))
        .write.mode("overwrite").parquet(dir)
      val probe = ext.range(50).select((col("id") % 10).as("k"), (col("id") * 7).as("pt"))
      // reference child is a JOIN subtree — the shape the runtime
      // extraOptimizations path cannot prune through (rule runs after the
      // fixed point there); via injectOptimizerRule the inserted Project
      // re-enters Catalyst's own ColumnPruning and reaches ReadSchema
      val dims = ext.range(10).select(col("id").as("k"), lit("dim").as("dim_tag"))
      val ref = ext.read.parquet(dir).join(dims, "k")
      val out = graft.plans.AsOfJoin.asofJoin(probe, ref,
          keys = Seq("k"), probeTimeCol = "pt", refTimeCol = "t")
        .select(col("k"), col("pt"), col("payload_r"))
      out.collect()
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.split("ReadSchema").drop(1)
          .forall(s => !s.takeWhile(_ != '\n').contains("unused_wide")),
        s"wide column still read through the join child:\n$plan")
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
