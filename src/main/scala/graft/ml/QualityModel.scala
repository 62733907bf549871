package graft.ml

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._


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
  def features(docs: DataFrame): DataFrame =
    featuresWith(unigramLm(docs), docs)

  /** The corpus's unigram frequency table — (token, c) — the xent
    * feature's reference distribution. Pinning THIS alongside the
    * coefficients is what makes a published gate replayable batch-by-
    * batch: against a pinned LM every feature is document-INTRINSIC,
    * so a doc's verdict is independent of which other docs arrive in
    * its micro-batch (the DedupStream gate's correctness argument).
    */
  def unigramLm(docs: DataFrame): DataFrame =
    tokenPairs(docs)
      .groupBy("token").agg(count(lit(1)).as("c"))

  /** The (doc_id, token) posting this model's features aggregate —
    * built by [[graft.queries.ReferenceQueries.docTokens]] (explode
    * drops empty token arrays, so the rows equal the old
    * filter(size>0)+explode form) WITHOUT persisting, so that when the
    * corpus is the session's shared one the CacheManager substitutes
    * the already-persisted x02/x04-family posting into this plan
    * (canonical-plan equality), and a run-scoped corpus (Pipeline,
    * stream micro-batches) stays unpersisted exactly as before.
    * Before this, x82 re-tokenized the corpus TWICE per call (once for
    * the LM, once for the features — 6 parquet scans, 0 cache hits in
    * plans/r17/x82_quality_model_before.txt); feature extraction is
    * the corpus-linear half of the quality gate, and the tokenize is
    * its scalar hot path (guide §1.2 step 1 / §2.4: share the one
    * materialization instead of recomputing it).
    */
  private def tokenPairs(docs: DataFrame): DataFrame =
    graft.queries.ReferenceQueries.docTokens(docs, persist = false)

  /** Per-doc features with xent read from an explicit unigram LM.
    * Tokens absent from the LM (possible only when scoring NEW data
    * with a pinned gate) back off to a half count — maximally
    * surprising without a log(0). `features(docs)` is exactly
    * `featuresWith(unigramLm(docs), docs)`, so fit-time and pinned
    * replay share one definition.
    */
  def featuresWith(lm: DataFrame, docs: DataFrame): DataFrame = {
    val tok = tokenPairs(docs)
    val tot = lm.agg(sum(col("c")).cast("double").as("n"))
    val stopwords = Seq("a", "the", "and", "of", "to", "in", "is", "it")
    // per-(doc, token) instance counts first: the per-doc aggregate
    // then reads one row per DISTINCT doc token (so distinct_ratio is
    // a plain count, no countDistinct/Expand) and instance-weighted
    // means reconstruct exactly via the tc weights
    val perDoc = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tc"))
    perDoc.join(lm, Seq("token"), "left")
      .withColumn("cc", coalesce(col("c").cast("double"), lit(0.5)))
      .crossJoin(broadcast(tot))
      .groupBy("doc_id").agg(
        sum(col("tc")).cast("double").as("n_tokens"),
        (sum(length(col("token")) * col("tc")) / sum(col("tc")))
          .cast("double").as("mean_tok_len"),
        (count(lit(1)).cast("double") / sum(col("tc"))).as("distinct_ratio"),
        (max(col("tc")).cast("double") / sum(col("tc"))).as("top_share"),
        (sum(when(col("token").isin(stopwords: _*), col("tc")).otherwise(0L))
          .cast("double") / sum(col("tc"))).as("stopword_ratio"),
        (sum(col("tc") * -log(col("cc") / col("n")))
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

  /** A fitted quality gate, reduced to what replay needs: the feature
    * names IN SCORING ORDER, the LR coefficients on the original
    * (unstandardized) feature scale, the intercept, and the operating
    * point. Small enough to live in the plan as literals — scoring is
    * a codegen'd closed-form column, no MLlib model object, so a
    * model roundtripped through a parquet table scores bit-identically
    * to the run that fitted it (doubles survive parquet exactly).
    */
  case class Fitted(featureNames: Seq[String], coefficients: Seq[Double],
      intercept: Double, threshold: Double, seedQuantile: Double)

  /** p_quality as a plan expression: sigmoid of the linear margin, the
    * exact arithmetic MLlib's binary-LR `probability` applies (dot in
    * feature order, then 1/(1+e^-m)).
    */
  private def pOf(m: Fitted): Column = {
    val margin = m.featureNames.zip(m.coefficients)
      .map { case (f, c) => col(f) * lit(c) }
      .reduceLeft(_ + _) + lit(m.intercept)
    lit(1.0) / (lit(1.0) + exp(-margin))
  }

  private def fitOnFeatures(feat: DataFrame, seedQuantile: Double,
      threshold: Double): Fitted = {
    val asm = new VectorAssembler()
      .setInputCols(FeatureCols).setOutputCol("f")
    val train = asm.transform(seeds(feat, seedQuantile))
    val lr = new LogisticRegression()
      .setFeaturesCol("f").setLabelCol("label")
      .setMaxIter(50).setRegParam(0.01).setStandardization(true)
    val model = lr.fit(train)
    Fitted(FeatureCols.toSeq, model.coefficients.toArray.toSeq,
      model.intercept, threshold, seedQuantile)
  }

  /** Fit the gate on `docs` (distant supervision over its own feature
    * extremes) and return it WITH the scored frame, sharing one
    * persisted feature pass: (model, (doc_id, p_quality, keep)).
    */
  /** `shareFeatures = true` keeps the feature frame in the session
    * cache registry (Caches.persist — released by Caches.clear on the
    * corpus's file lineage) instead of the call-scoped persist, so the
    * returned scored frame — and any repeat call — reads the
    * materialized features rather than recomputing the pipeline after
    * the `finally` unpersist (the scored frame is LAZY: under the old
    * call-scoped persist its evaluation always re-ran the full feature
    * pass because the unpersist had already happened). Only the
    * whole-dataset query entry (x82) opts in; run-scoped corpora
    * (Pipeline gates over checkpointed survivor frames, which have no
    * file lineage for Caches.clear to release) keep the call-scoped
    * persist.
    */
  def fitAndScore(docs: DataFrame, seedQuantile: Double = 0.1,
      threshold: Double = 0.5,
      shareFeatures: Boolean = false): (Fitted, DataFrame) = {
    val raw = features(docs)
    // a call-scoped persist over a plan someone already REGISTERED as
    // a session cache would be a no-op persist whose unpersist then
    // tears down the shared entry's data (CacheManager keys by
    // canonical plan) — ride the registered entry instead
    val shared = shareFeatures || graft.Caches.isRegistered(raw)
    val feat =
      if (shareFeatures) graft.Caches.persist(raw)
      else if (shared) raw
      else raw.persist()
    try {
      val m = fitOnFeatures(feat, seedQuantile, threshold)
      (m, feat.select(col("doc_id"), pOf(m).as("p_quality"),
        (pOf(m) >= lit(m.threshold)).as("keep")))
    } finally {
      if (!shared) { feat.unpersist(); () }
    }
  }

  /** Score `docs` with a PINNED model — the replay path: a consumer
    * loads the snapshot's model and re-applies THE gate that curated
    * the release to the same (identical verdicts) or new data. Note
    * the xent/top_share-style features are corpus-relative by
    * definition (the unigram model is the scored corpus's own), so
    * identical-verdict replay means identical INPUT corpus; on new
    * data the model transfers the learned decision surface.
    */
  def scoreWith(m: Fitted, docs: DataFrame): DataFrame =
    features(docs).select(col("doc_id"), pOf(m).as("p_quality"),
      (pOf(m) >= lit(m.threshold)).as("keep"))

  /** Score against a PINNED unigram LM — the streaming-gate form:
    * per-doc verdicts are independent of batch slicing (see
    * [[unigramLm]]), so a stream scoring micro-batches and a batch
    * job scoring the union produce identical keep/drop sets.
    */
  def scoreWithLm(m: Fitted, lm: DataFrame, docs: DataFrame): DataFrame =
    featuresWith(lm, docs).select(col("doc_id"), pOf(m).as("p_quality"),
      (pOf(m) >= lit(m.threshold)).as("keep"))

  /** Train on the seed slices, score EVERY doc: (doc_id, p_quality). */
  def score(docs: DataFrame, seedQuantile: Double = 0.1,
      shareFeatures: Boolean = false): DataFrame =
    fitAndScore(docs, seedQuantile, shareFeatures = shareFeatures)
      ._2.select("doc_id", "p_quality")

  /** The model as a one-row snapshot table (the tokenizer precedent:
    * the artifact that made the release ships IN the release).
    */
  def toTable(spark: SparkSession, m: Fitted): DataFrame = {
    import spark.implicits._
    Seq((m.featureNames, m.coefficients, m.intercept, m.threshold,
      m.seedQuantile))
      .toDF("features", "coefficients", "intercept", "threshold",
        "seed_quantile")
  }

  def fromTable(table: DataFrame): Fitted = {
    val r = table.select("features", "coefficients", "intercept",
      "threshold", "seed_quantile").head()
    Fitted(r.getSeq[String](0), r.getSeq[Double](1), r.getDouble(2),
      r.getDouble(3), r.getDouble(4))
  }

  /** Rows-only query projection: scores rounded for stability, plus the
    * verdict at the 0.5 operating point.
    */
  def scoreStats(spark: SparkSession, sfDir: String): DataFrame =
    score(graft.Tables.documents(spark, sfDir), shareFeatures = true)
      .select(col("doc_id"),
        round(col("p_quality"), 4).as("p_quality"),
        (col("p_quality") >= 0.5).as("keep"))
      .orderBy("doc_id")
}
