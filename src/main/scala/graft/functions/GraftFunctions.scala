package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL-surface registration: expose the engine's custom expressions to
  * `spark.sql(...)` users (the reference exposes nothing — its "API" is
  * three scripts; the engine's public surface is Column functions +
  * these SQL names).
  */
object GraftFunctions {
  import org.apache.spark.sql.catalyst.expressions.Expression

  /** Arity-checked builder (same contract as GraftExtensions.arity). */
  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    exprs => {
      require(exprs.length == n,
        s"$name expects $n argument(s), got ${exprs.length}")
      build(exprs)
    }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("floats_to_binary",
      exprs => FloatsToBinary(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("binary_to_floats",
      exprs => BinaryToFloats(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_token_count",
      exprs => TokenCount(
        org.apache.spark.sql.catalyst.expressions.Lower(exprs.head)),
      "scala_udf")
    // Tokenizer as a plain UDF for SQL contexts (the Column form in
    // Tokenize.tokens is pure built-ins and preferred in plans).
    spark.udf.register("graft_tokens", (s: String) =>
      if (s == null) Array.empty[String]
      else s.toLowerCase(java.util.Locale.ROOT).split("[^a-z0-9]+").filter(_.nonEmpty))
    // Per-language dispatch (incl. the zh bigram rule) for SQL users:
    // SELECT graft_tokens_lang(text, lang). A UDF over the JVM
    // reference rule — TokenizeSpec pins it equal to the Column-form
    // tokensByLang (expression injection is impossible for
    // lambda-bearing Column trees in Spark 4; see tokensLangRef doc).
    spark.udf.register("graft_tokens_lang",
      (s: String, lang: String) => Tokenize.tokensLangRef(s, lang))
    // The axpy Aggregator (A3) for SQL users: SELECT vec_weighted_sum(w,
    // vec) ... GROUP BY doc. Same single-buffer partial/final merge as
    // the Column form; dimension-adaptive since SQL can't pass a dim.
    spark.udf.register("vec_weighted_sum",
      org.apache.spark.sql.functions.udaf(new graft.agg.WeightedVecSumAny))
    // Mergeable KLL quantile sketches (hll_sketch_agg's missing
    // quantile sibling): SELECT graft_kll_quantile(graft_kll_merge(sk),
    // 0.5) over per-slice sketch tables. The analyzer wraps the raw
    // AggregateFunction, same as injectFunction does.
    reg.createOrReplaceTempFunction("graft_kll_agg",
      arity("graft_kll_agg", 2)(KllExpressions.kllAggBuilder), "scala_udf")
    reg.createOrReplaceTempFunction("graft_kll_merge",
      KllExpressions.kllMergeBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("graft_kll_quantile",
      arity("graft_kll_quantile", 2)(exprs => KllQuantile(exprs(0), exprs(1))),
      "scala_udf")
    // Mergeable frequent-items sketches: SELECT
    // graft_freq_top_k(graft_freq_merge(sk), 5) over sketch tables.
    // Arity-checked like the GraftExtensions path: a wrong-arity SQL
    // call gets a function-named error, not an IndexOutOfBounds.
    reg.createOrReplaceTempFunction("graft_freq_agg",
      arity("graft_freq_agg", 2)(FreqExpressions.freqAggBuilder), "scala_udf")
    reg.createOrReplaceTempFunction("graft_freq_merge",
      FreqExpressions.freqMergeBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("graft_freq_top_k",
      arity("graft_freq_top_k", 2)(exprs => FreqTopK(exprs(0), exprs(1))),
      "scala_udf")
    // Bloom membership filters: the join-side sketch. Only the BUILD
    // has a SQL form — the probe needs a Broadcast handle (Column API,
    // see functions/BloomExpressions).
    reg.createOrReplaceTempFunction("graft_bloom_agg",
      arity("graft_bloom_agg", 3)(BloomExpressions.bloomAggBuilder),
      "scala_udf")
    // Theta sketches: distinct estimates with set operations.
    reg.createOrReplaceTempFunction("graft_theta_agg",
      arity("graft_theta_agg", 2)(ThetaExpressions.thetaAggBuilder),
      "scala_udf")
    reg.createOrReplaceTempFunction("graft_theta_union",
      ThetaExpressions.thetaUnionBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("graft_theta_estimate",
      arity("graft_theta_estimate", 1)(exprs => ThetaEstimate(exprs.head)),
      "scala_udf")
    Seq("intersect", "diff", "union").foreach { op =>
      reg.createOrReplaceTempFunction(s"graft_theta_${op}_estimate",
        arity(s"graft_theta_${op}_estimate", 2)(
          ThetaExpressions.setEstimateBuilder(op)), "scala_udf")
    }
  }
}
