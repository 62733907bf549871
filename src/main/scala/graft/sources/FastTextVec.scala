package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** fastText `.vec` text-format source (SURVEY.md S7).
  *
  * The reference loads the binary `cc.<lang>.300.bin` model through the
  * fasttext library and upserts `(word, float32-blob)` rows
  * (`enter_wordvecs.py:27-44`, with the `len >= 100` garbage gate).
  * fastText models are ALSO distributed as plain-text `.vec` files —
  * a `"nwords dim"` header line, then one `"word v1 v2 … vdim"` line
  * per word — which is the format a Spark-native ingest wants: line
  * files split across tasks for free, and the parse is a codegen'd
  * split/slice/cast projection, no UDF, no driver-side model load.
  *
  * At 100 TB-adjacent scale (the real cc.en.300 is 2M words × 300
  * dims ≈ 4.5 GB of text) the file parallelizes across line splits
  * and the result feeds the broadcast word-vector dimension directly.
  */
object FastTextVec {

  /** Read a `.vec` file as (word, vec float array), applying the
    * reference's `length(word) < 100` garbage gate. The header line
    * (exactly two numeric fields) is dropped structurally, not by
    * position — position is meaningless across file splits.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    // split on WS runs and drop empties: real .vec files carry
    // trailing (and occasionally doubled) spaces, which a single-space
    // split would turn into empty fields — a null vector component, or
    // a 3-field header slipping past the header filter
    val parts = spark.read.text(path)
      .select(filter(split(col("value"), "[ \\t]+"), t => t =!= lit(""))
        .as("f"))
    parts
      .filter(size(col("f")) > 2) // header is "nwords dim"
      .select(col("f").getItem(0).as("word"),
        // slice length must be computed, not Int.MaxValue: slice
        // overflows start+length internally and returns empty
        transform(slice(col("f"), lit(2), size(col("f")) - 1),
          x => x.cast("float")).as("vec"))
      .filter(length(col("word")) < 100) // enter_wordvecs.py:36
      // a non-numeric field casts to null — drop the malformed line
      // loudly absent rather than carrying a poisoned vector
      .filter(!exists(col("vec"), x => x.isNull))
  }

  /** Round-trip writer for specs and fixtures: (word, vec) → `.vec`
    * text with the standard header.
    */
  def write(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val n = df.count()
    val dim = df.select(size(col("vec"))).head().getInt(0)
    val header = Seq(s"$n $dim").toDF("value")
    val lines = df.select(concat_ws(" ", col("word"),
      concat_ws(" ", transform(col("vec"), v => v.cast("string")))).as("value"))
    header.union(lines).coalesce(1).write.mode("overwrite").text(path)
  }
}
