package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * SparkSessionExtensions injector: makes every graft native expression
 * available to PLAIN SQL sessions with zero Scala calls —
 *
 * {{{
 *   spark-sql --conf spark.sql.extensions=graft.plans.GraftExtensions
 *   SELECT cosine_f32(a.embedding, b.embedding) FROM ...
 * }}}
 *
 * The Column-API paths (`VectorFunctions.register` / `SketchFunctions
 * .register` / `HiveTypes.register`) stay the per-session registration for
 * library callers; this class is the deployment-level twin the Spark
 * ecosystem expects from an extension library (the builder brief's
 * `SparkSessionExtensions` integration point). Both routes resolve to the
 * SAME expression constructors, so SQL and Column usage cannot drift.
 *
 * Injected functions build native codegen'd expressions; scalar parameters
 * must be literals (enforced by the factories with clear errors).
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo("graft.plans", name)

  private def inject(ext: SparkSessionExtensions, name: String,
      builder: Seq[Expression] => Expression): Unit =
    ext.injectFunction((FunctionIdentifier(name), info(name), builder))

  override def apply(ext: SparkSessionExtensions): Unit = {
    // vector plane (VectorExpressions)
    inject(ext, "dot_f32", exprs => DotProductFloat(exprs(0), exprs(1)))
    inject(ext, "cosine_f32", exprs => CosineSimilarityFloat(exprs(0), exprs(1)))
    inject(ext, "vec_absmax", exprs => VecAbsMaxFloat(exprs(0)))
    inject(ext, "quantize_i8", exprs => QuantizeInt8(exprs(0)))
    inject(ext, "dequantize_i8", exprs => DequantizeInt8(exprs(0), exprs(1)))
    inject(ext, "lsh_bucket", exprs => {
      require(exprs.length == 4,
        s"lsh_bucket(vec, dim, nPlanes, seed) takes 4 arguments, got ${exprs.length}")
      LshBucketExpr(exprs(0), foldInt(exprs(1), "dim"), foldInt(exprs(2), "nPlanes"),
        foldLong(exprs(3), "seed"))
    })
    inject(ext, "lsh_bands", exprs => {
      require(exprs.length == 5,
        s"lsh_bands(vec, dim, bands, planesPerBand, seed) takes 5 arguments, got ${exprs.length}")
      LshBandsExpr(exprs(0), foldInt(exprs(1), "dim"), foldInt(exprs(2), "bands"),
        foldInt(exprs(3), "planesPerBand"), foldLong(exprs(4), "seed"))
    })
    // sketch plane (SketchExpressions)
    inject(ext, "minhash_sig", exprs => MinHashSignature(exprs(0), foldInt(exprs(1), "k")))
    inject(ext, "minhash_bands", exprs => MinHashBandHashes(exprs(0), foldInt(exprs(1), "bands")))
    inject(ext, "simhash64", exprs => SimHash64(exprs(0)))
    inject(ext, "sig_agreement", exprs => SignatureAgreement(exprs(0), exprs(1)))
    inject(ext, "word_ngrams", exprs => WordNgramsExpr(exprs(0), foldInt(exprs(1), "n")))
    inject(ext, "min_gram_md5", exprs => MinGramMd5(exprs(0), foldInt(exprs(1), "n")))
    inject(ext, "bottom_k_md5", exprs => BottomKMd5(exprs(0), foldInt(exprs(1), "k")))
    inject(ext, "ngram_explode", exprs => NgramExplode(exprs(0), foldInt(exprs(1), "n")))
    inject(ext, "zorder2", exprs => ZOrder2(exprs(0), exprs(1)))
    inject(ext, "bpe_encode", exprs => {
      require(exprs.length == 2,
        s"bpe_encode(text, merges) takes 2 arguments, got ${exprs.length}")
      BpeEncode(exprs(0), SketchFunctions.foldableMerges(exprs(1)))
    })
    inject(ext, "byte_bpe_encode", exprs => {
      require(exprs.length == 2,
        s"byte_bpe_encode(text, merges) takes 2 arguments, got ${exprs.length}")
      ByteBpeEncode(exprs(0), SketchFunctions.foldableMerges(exprs(1)))
    })
    // as-of join operator (§2.8c): strategy + its two optimizer rules.
    // injectOptimizerRule lands them INSIDE the operator-optimization
    // fixed point, so the child Projects/Filters the rules insert cascade
    // through Catalyst's own ColumnPruning/PushDownPredicates into the
    // scans even when a join/aggregate subtree sits between — the
    // runtime `spark.experimental` path (AsOfJoin.register) cannot get
    // that, it runs after the fixed point (see note there).
    ext.injectPlannerStrategy(_ => AsOfJoinPlans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => AsOfJoinPlans.PushProbeFilterThroughAsOfJoin)
    ext.injectOptimizerRule(_ => AsOfJoinPlans.PruneAsOfJoinColumns)
  }

  private def foldInt(e: Expression, name: String): Int = {
    require(e.foldable, s"$name must be a literal")
    e.eval().asInstanceOf[Number].intValue()
  }

  private def foldLong(e: Expression, name: String): Long = {
    require(e.foldable, s"$name must be a literal")
    e.eval().asInstanceOf[Number].longValue()
  }
}
