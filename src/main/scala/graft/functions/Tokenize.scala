package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The engine's tokenizer spec (SURVEY.md F1/F2).
  *
  * The reference tokenizes with a per-language spaCy model
  * (`worker.py:17-18,35`, `calculate_idf_scores.py:21-23,47`), which is
  * not replicable in a SQL oracle. The engine therefore *defines*
  * tokenization as: lowercase, then maximal runs of `[a-z0-9]` (ASCII).
  * The DuckDB-oracle equivalent is
  * `list_filter(string_split_regex(lower(x), '[^a-z0-9]+'), t -> t <> '')`.
  *
  * Built entirely from codegen'd Catalyst functions — no UDF — so it
  * stays inside whole-stage codegen at 100 TB scan scale.
  */
object Tokenize {
  /** tokens(text): array<string> — lowercase alnum runs, empties dropped. */
  def tokens(c: Column): Column =
    filter(split(lower(c), "[^a-z0-9]+"), t => t =!= lit(""))

  /** Word n-gram shingles of the token array (for MinHash / Jaccard
    * dedup). Uses the codegen'd `transform`+`slice` HOFs; returns
    * `array<string>` of space-joined n-grams (fewer than n tokens →
    * empty array).
    */
  def shingles(tokensCol: Column, n: Int): Column =
    // sequence(a, b) counts *down* when a > b, so guard short docs.
    when(size(tokensCol) >= n,
      transform(sequence(lit(1), size(tokensCol) - (n - 1)),
        i => concat_ws(" ", slice(tokensCol, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
}
