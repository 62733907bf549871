package graft.ml

import org.apache.spark.ml.feature.{HashingTF, IDF, Normalizer, RegexTokenizer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MLlib batch embedding generation (BASELINE.json north-star:
  * "MLlib for batch embedding generation").
  *
  * The reference computes TF-IDF-weighted fastText embeddings one post
  * at a time over RPCs (`worker.py:69-94`); at scale the idiomatic batch
  * form is an MLlib pipeline: RegexTokenizer (same token spec as
  * graft.functions.Tokenize) -> HashingTF (fixed-width, no vocab
  * broadcast needed at 100 TB) -> IDF -> L2 Normalizer. Deterministic
  * (murmur3 hashing, closed-form IDF) but not SQL-expressible, so its
  * query entry is declared without oracle SQL (rows-only check).
  */
object BatchEmbed {

  val NumFeatures = 1024

  /** (doc_id, lang, embedding: Vector) — L2-normalized hashed TF-IDF. */
  def embed(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, sfDir)
    val tokenizer = new RegexTokenizer()
      .setInputCol("text").setOutputCol("toks")
      .setPattern("[^a-z0-9]+").setToLowercase(true)
    val tf = new HashingTF()
      .setInputCol("toks").setOutputCol("tf").setNumFeatures(NumFeatures)
    val tokens = tf.transform(tokenizer.transform(docs))
    val idfModel = new IDF().setInputCol("tf").setOutputCol("tfidf").fit(tokens)
    val norm = new Normalizer().setInputCol("tfidf").setOutputCol("embedding").setP(2.0)
    norm.transform(idfModel.transform(tokens))
      .select("doc_id", "lang", "embedding")
  }

  /** Deterministic scalar projection for the (rows-only) query entry:
    * per-doc embedding norm (==1 after L2 normalize unless empty) and
    * nonzero count.
    */
  def embedStats(spark: SparkSession, sfDir: String): DataFrame = {
    embed(spark, sfDir)
      .withColumn("arr", org.apache.spark.ml.functions.vector_to_array(col("embedding")))
      .select(col("doc_id"), col("lang"),
        round(sqrt(aggregate(col("arr"), lit(0.0), (a, x) => a + x * x)), 6).as("l2"),
        size(filter(col("arr"), x => x =!= 0.0)).as("nnz"))
      .orderBy("doc_id")
  }
}
