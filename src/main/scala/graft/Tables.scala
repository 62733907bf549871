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

  /** Cheap source-identity fingerprint of one table from filesystem
    * METADATA (no data scan): an MD5 digest over the RECURSIVE,
    * path-sorted (relative-path, length, mtime) tuples of every file
    * under the table root. Published inside derived artifacts
    * (Bm25Index / IvfPq / Whiten loadOrPublish) so a snapshot built
    * from an older copy of the table is detected and republished
    * instead of silently served. Per-file tuples, not a size sum +
    * max-mtime of immediate children (round-11 advice): a regenerated
    * table with an identical TOTAL byte size, or a change inside a
    * nested partition subdirectory, must still read as a new identity.
    */
  def fileFingerprint(spark: SparkSession, sfDir: String,
      name: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$sfDir/$name.parquet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = fs.makeQualified(p).toString
    val tuples = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = fs.listFiles(p, true) // recursive: nested partition dirs count
    while (it.hasNext) {
      val st = it.next()
      val rel = st.getPath.toString.stripPrefix(base)
      tuples += s"$rel:${st.getLen}:${st.getModificationTime}"
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    tuples.sorted.foreach(t => md.update(t.getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  def documents(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "embeddings")

  /** `events.ts` normalization — the generated parquet has shipped two
    * timestamp vintages, and every downstream query assumes a plain
    * session-zoned TIMESTAMP (`unix_micros` rejects anything else):
    *  - TIMESTAMP(NANOS), which Spark only reads as a nanos-since-epoch
    *    long (`spark.sql.legacy.parquet.nanosAsLong`, set in
    *    Verify/Bench/specs) → truncate to micros. DuckDB's
    *    `ts::TIMESTAMP` cast truncates identically.
    *  - TIMESTAMP(MICROS) without the UTC-adjusted flag → Spark reads
    *    TIMESTAMP_NTZ → reinterpret as session-zone wall clock. The
    *    session timezone is pinned to UTC everywhere (Verify/Bench/
    *    specs), so the instant equals DuckDB's naive-as-UTC reading.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = load(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
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
