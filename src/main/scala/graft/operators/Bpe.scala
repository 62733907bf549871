package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding merge learning — the tokenizer-
  * TRAINING step of an LLM data pipeline (the published BPE subword
  * algorithm: greedily merge the most frequent adjacent symbol pair,
  * k times, frequency-weighted over the corpus word-frequency table).
  *
  * Scale structure, which is the whole point of doing this on Spark:
  * the corpus-sized work happens ONCE (the token-frequency count that
  * produces `words`); every one of the k training iterations runs over
  * the VOCABULARY-sized frame (distinct words × symbol arrays), which
  * at 100 TB is millions of rows, not billions — each iteration is a
  * dimension-table job (explode adjacent pairs → one groupBy → 1-row
  * argmax), and the argmax is the only driver-side value (bounded
  * metadata, the IvfIndex-centroid precedent). The per-round
  * `localCheckpoint` is x29's loop hygiene: it cuts the k-deep lineage
  * so round j's plan doesn't replay rounds 1..j-1.
  *
  * Determinism: ties on pair count break lexicographically (left, then
  * right), so the merge table is a pure function of the word-frequency
  * table; the spec pins Spark ≡ a single-node reference implementation
  * on fixtures and on the corpus.
  */
object Bpe {
  case class Merge(rank: Int, left: String, right: String,
      merged: String, pair_count: Long)

  /** End-of-word sentinel (the classic formulation: "est" inside a word
    * and "est</w>" at its end are distinct symbols, so merges never
    * cross word boundaries when applied to running text).
    */
  val Eow = "</w>"

  /** (token, freq) → (token, freq, syms): characters + the `</w>` mark. */
  def initialSymbols(words: DataFrame): DataFrame =
    words.select(col("token"), col("freq"),
      concat(filter(split(col("token"), ""), s => s =!= lit("")),
        array(lit(Eow))).as("syms"))

  /** One greedy left-to-right application of merge (l, r) to a symbol
    * array, as a fold: after a merge the cursor moves past the merged
    * symbol (the new last element is `lr`, which only re-merges if
    * l == lr — same as the reference algorithm's scan).
    */
  private def mergeOnce(syms: Column, l: String, r: String): Column = {
    val m = l + r
    aggregate(syms, array().cast("array<string>"), (acc, s) =>
      when(size(acc) > 0 &&
          element_at(acc, -1) === lit(l) && s === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(m))))
        .otherwise(concat(acc, array(s))))
  }

  /** Adjacent symbol pairs of every word, frequency-weighted and
    * summed: the zip of the symbol array with its own tail (clamped
    * slices make sub-2-symbol words contribute nothing).
    */
  private def pairCounts(cur: DataFrame): DataFrame =
    cur.select(col("freq"),
        explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("freq")).as("cnt"))

  /** Learn up to k merges from a (token, freq) word-frequency table.
    * Stops early when the best pair's weighted count drops below 2 (a
    * count-1 merge compresses nothing). Returns the ranked merge table
    * and the final symbol state (token, freq, syms).
    */
  def train(spark: SparkSession, words: DataFrame, k: Int): (Seq[Merge], DataFrame) = {
    var cur = initialSymbols(words).localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var done = false
    while (!done && merges.size < k) {
      val best = pairCounts(cur)
        .orderBy(desc("cnt"), asc("l"), asc("r")).limit(1).collect()
      if (best.isEmpty || best(0).getAs[Long]("cnt") < 2L) done = true
      else {
        val (l, r, c) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(merges.size + 1, l, r, l + r, c)
        cur = cur.withColumn("syms", mergeOnce(col("syms"), l, r))
          .localCheckpoint(true)
      }
    }
    (merges.toSeq, cur)
  }

  /** Apply a learned merge table, in rank order, to a (token, freq)
    * frame — the ENCODE side (tokenizing new text against a trained
    * vocabulary). One narrow projection per merge, no shuffles.
    */
  def encode(words: DataFrame, merges: Seq[Merge]): DataFrame =
    merges.foldLeft(initialSymbols(words)) { (df, m) =>
      df.withColumn("syms", mergeOnce(col("syms"), m.left, m.right))
    }
}
