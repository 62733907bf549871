package graft.ml

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Tokenize

/** Model-based quality filtering — the classifier leg of the published
  * LLM-curation recipe: heuristic signals (x08) gate the obvious
  * garbage, and a LEARNED quality model scores everything else, trained
  * by distant supervision (seed the classes from the corpus's own
  * extremes, no hand labels). The reference pipeline has no analogue;
  * this is the north-star "quality scoring" leg taken from heuristic
  * to model.
  *
  * Scale structure: feature extraction is ONE corpus-linear projection
  * (token stats + the x71-style unigram cross-entropy, whose "model" is
  * a vocabulary-keyed dimension join); the trainer only ever sees the
  * SEED rows (two quantile slices — corpus-bounded but tiny in
  * practice); scoring is a broadcast of the fitted coefficient vector
  * inside MLlib's transform — one more projection. Nothing pairwise,
  * nothing iterative over the corpus (LBFGS iterates over the seed
  * set).
  *
  * Determinism: the features are closed-form, the seeds are quantile
  * cuts of a deterministic signal, and LBFGS on a fixed seed set with
  * fixed initialization is deterministic up to float reduction order —
  * which is why the spec pins RANKING properties (seed-class
  * separation, planted garbage below planted clean) rather than
  * coefficient bytes, the IvfRecallSpec discipline for ML legs.
  */
object QualityModel {

  /** Per-doc quality features, all from one tokenize pass + one
    * vocabulary join: length, mean token length, distinct ratio,
    * dominant-token share (repetition), stopword share (an 8-word
    * English function-word list — a superset of x08's 6; kept
    * separate because the fitted model's specs pin this feature),
    * and the corpus-self-trained unigram cross-entropy (x71's signal).
    */
  def features(docs: DataFrame): DataFrame = {
    val tok = docs
      .select(col("doc_id"), Tokenize.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), explode(col("toks")).as("token"))
    val cnt = tok.groupBy("token").agg(count(lit(1)).as("c"))
    val tot = cnt.agg(sum(col("c")).cast("double").as("n"))
    val stopwords = Seq("a", "the", "and", "of", "to", "in", "is", "it")
    // per-(doc, token) instance counts first: the per-doc aggregate
    // then reads one row per DISTINCT doc token (so distinct_ratio is
    // a plain count, no countDistinct/Expand) and instance-weighted
    // means reconstruct exactly via the tc weights
    val perDoc = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tc"))
    perDoc.join(cnt, Seq("token"))
      .crossJoin(broadcast(tot))
      .groupBy("doc_id").agg(
        sum(col("tc")).cast("double").as("n_tokens"),
        (sum(length(col("token")) * col("tc")) / sum(col("tc")))
          .cast("double").as("mean_tok_len"),
        (count(lit(1)).cast("double") / sum(col("tc"))).as("distinct_ratio"),
        (max(col("tc")).cast("double") / sum(col("tc"))).as("top_share"),
        (sum(when(col("token").isin(stopwords: _*), col("tc")).otherwise(0L))
          .cast("double") / sum(col("tc"))).as("stopword_ratio"),
        (sum(col("tc") * -log(col("c").cast("double") / col("n")))
          / sum(col("tc"))).cast("double").as("xent"))
  }

  /** Distant-supervision seeds: the top and bottom `quantile` slices of
    * a deterministic weak signal (here: the xent distance from the
    * corpus median — both tails are suspect, x71's rationale — combined
    * with repetition). Returns (features, label) for the seed rows only.
    */
  private def seeds(feat: DataFrame, quantile: Double): DataFrame = {
    val cuts = feat.stat.approxQuantile("xent",
      Array(quantile, 1.0 - quantile), 0.0)
    val (lo, hi) = (cuts(0), cuts(1))
    feat.withColumn("label",
        when(col("xent") <= lo, 0.0) // templated/boilerplate tail
          .when(col("xent") >= hi, 0.0) // lexical-garbage tail
          .otherwise(1.0))
      .withColumn("seed",
        col("xent") <= lo || col("xent") >= hi ||
          (col("xent") > (lo + hi) / 2 - (hi - lo) / 4 &&
            col("xent") < (lo + hi) / 2 + (hi - lo) / 4))
      .filter(col("seed")).drop("seed")
  }

  private val FeatureCols = Array("n_tokens", "mean_tok_len",
    "distinct_ratio", "top_share", "stopword_ratio", "xent")

  /** Train on the seed slices, score EVERY doc: (doc_id, p_quality). */
  def score(docs: DataFrame, seedQuantile: Double = 0.1): DataFrame = {
    val feat = features(docs).persist()
    try {
      val asm = new VectorAssembler()
        .setInputCols(FeatureCols).setOutputCol("f")
      val train = asm.transform(seeds(feat, seedQuantile))
      val lr = new LogisticRegression()
        .setFeaturesCol("f").setLabelCol("label")
        .setMaxIter(50).setRegParam(0.01).setStandardization(true)
      val model = lr.fit(train)
      model.transform(asm.transform(feat))
        .withColumn("p_quality",
          org.apache.spark.ml.functions.vector_to_array(col("probability"))(1))
        .select(col("doc_id"), col("p_quality"))
    } finally feat.unpersist()
  }

  /** Rows-only query projection: scores rounded for stability, plus the
    * verdict at the 0.5 operating point.
    */
  def scoreStats(spark: SparkSession, sfDir: String): DataFrame =
    score(graft.Tables.documents(spark, sfDir))
      .select(col("doc_id"),
        round(col("p_quality"), 4).as("p_quality"),
        (col("p_quality") >= 0.5).as("keep"))
      .orderBy("doc_id")
}
