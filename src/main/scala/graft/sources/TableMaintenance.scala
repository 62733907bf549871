package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-maintenance operators for a large parquet store — the jobs a
  * 100 TB deployment schedules nightly, not query-time operators.
  *
  * **Small-file compaction**: streaming ingest and fine-grained upserts
  * leave thousands of KB-sized files per partition; every query then
  * pays one task + one footer-read per file, and the NameNode/listing
  * cost grows without bound. `compact` rewrites a directory into
  * size-targeted files (count = ceil(bytes / targetBytes)), atomically:
  * write to a temp sibling, validate the row count, swap directories.
  *
  * **Range-clustered write**: `writeClustered` lays data out ordered by
  * a clustering key — `repartitionByRange` makes files key-disjoint and
  * `sortWithinPartitions` orders rows inside each file, so parquet
  * min/max stats turn a selective key predicate into file- and
  * row-group-level skipping. This is the poor-man's Z-order: one
  * dimension, zero dependencies, and the dominant access path
  * (key-range scans) reads a fraction of the files.
  */
object TableMaintenance {

  /** Number of parquet part-files under `dir`. */
  def dataFileCount(spark: SparkSession, dir: String): Int = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0
    else fs.listStatus(p).count { st =>
      st.isFile && st.getPath.getName.startsWith("part-")
    }
  }

  private def dataBytes(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter(st => st.isFile &&
      st.getPath.getName.startsWith("part-")).map(_.getLen).sum
  }

  /** Rewrite the parquet directory at `dir` into ~targetBytes files.
    * Atomic: the compacted copy is written to a temp sibling first and
    * only swapped in after its row count matches the source; a crash
    * mid-compaction leaves the original untouched. Returns the new
    * file count.
    */
  def compact(spark: SparkSession, dir: String,
      targetBytes: Long = 128L << 20): Int = {
    val src = spark.read.parquet(dir)
    val expected = src.count()
    val nFiles = math.max(1,
      math.ceil(dataBytes(spark, dir).toDouble / targetBytes).toInt)
    val tmp = s"$dir.compact.tmp"
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // coalesce, not repartition: compaction must not pay a shuffle,
    // only a rewrite (narrow dependency merging input splits)
    src.coalesce(nFiles).write.mode("overwrite").parquet(tmp)
    val got = spark.read.parquet(tmp).count()
    if (got != expected) {
      fs.delete(new Path(tmp), true) // don't leave a full copy behind
      throw new IllegalStateException(
        s"compaction row-count mismatch: $got != $expected — keeping original")
    }
    // two renames cannot be one atomic step: a crash between them
    // leaves the table at $dir.compact.old and the compacted copy at
    // $dir.compact.tmp — both intact, recoverable by renaming either
    // back into place (the original is never deleted until the
    // compacted copy is live)
    val bak = new Path(s"$dir.compact.old")
    fs.delete(bak, true)
    require(fs.rename(p, bak), s"could not move $dir aside")
    require(fs.rename(new Path(tmp), p), s"could not move compacted $tmp in")
    fs.delete(bak, true)
    dataFileCount(spark, dir)
  }

  /** Write `df` range-clustered on `clusterCol` into `nFiles` files:
    * files are key-disjoint (range partitioning) and internally sorted,
    * so parquet min/max statistics prune files and row groups on
    * key-range predicates.
    */
  def writeClustered(df: DataFrame, path: String, clusterCol: String,
      nFiles: Int): Unit =
    df.repartitionByRange(nFiles, col(clusterCol))
      .sortWithinPartitions(clusterCol)
      .write.mode("overwrite").parquet(path)

  /** Per-file (min, max) of `keyCol` under `path` — the statistics the
    * scan planner prunes with; exposed for specs and layout audits.
    */
  def fileKeyRanges(spark: SparkSession, path: String,
      keyCol: String): Seq[(String, Long, Long)] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .map { st =>
        val one = spark.read.parquet(st.getPath.toString)
          .agg(min(col(keyCol)).cast("long"), max(col(keyCol)).cast("long"))
          .head()
        (st.getPath.getName, one.getLong(0), one.getLong(1))
      }
  }
}
