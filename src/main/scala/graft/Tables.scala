package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata star schema + domain tables.
  *
  * The reference engine reads MongoDB collections (`hive.comments`,
  * `hive.replies`, `fasttext.word-vectors-<lang>` — reference
  * `worker.py:99`, `enter_wordvecs.py:10-11`); here every table is a
  * columnar Parquet scan so Catalyst gets predicate pushdown + column
  * pruning for free (SURVEY.md §4).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def documents(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "embeddings")

  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark only reads as
    * a nanos-since-epoch long (`spark.sql.legacy.parquet.nanosAsLong`,
    * set in Verify/Bench/specs). Normalize to a microsecond timestamp by
    * truncation — DuckDB's `ts::TIMESTAMP` cast truncates identically,
    * so oracle SQL sees the same instants.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = load(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
      case _ => raw
    }
  }
  def lineitem(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "region")
}
