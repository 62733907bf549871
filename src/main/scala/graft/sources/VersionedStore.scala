package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot-versioned parquet store — reproducible dataset versions for
  * training pipelines (a run must be able to pin "documents as of
  * snapshot 3" forever, while ingest keeps appending new snapshots).
  *
  * Layout: one immutable directory per version (`<root>/v=N/`), plus a
  * tiny `_latest` marker file naming the current version. Readers of a
  * pinned version touch exactly one directory; nothing is ever rewritten
  * (writers only add `v=N+1`), so concurrent readers can't observe a
  * half-replaced snapshot — the publish is the atomic rename of the
  * marker's temp file. At 100 TB each snapshot is just a partitioned
  * parquet dataset; the versioning cost is one directory level. Full
  * Delta/Iceberg-style row-level time travel is out of scope — this is
  * the dependency-free snapshot recipe.
  */
object VersionedStore {

  private def markerPath(root: String) =
    java.nio.file.Paths.get(root, "_latest")

  /** Highest published version, or None for an empty store. */
  def latestVersion(root: String): Option[Long] = {
    val m = markerPath(root)
    if (java.nio.file.Files.exists(m))
      Some(java.nio.file.Files.readString(m).trim.toLong)
    else None
  }

  /** Write `df` as the next snapshot and publish it; returns the new
    * version number. The marker is written to a temp file then moved
    * with ATOMIC_MOVE so a concurrent reader sees either the old or the
    * new version, never a torn marker.
    */
  def publish(df: DataFrame, root: String): Long = {
    val next = latestVersion(root).getOrElse(-1L) + 1L
    df.write.mode("errorifexists").parquet(s"$root/v=$next")
    val tmp = java.nio.file.Paths.get(root, s"_latest.tmp.$next")
    java.nio.file.Files.writeString(tmp, next.toString)
    java.nio.file.Files.move(tmp, markerPath(root),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    next
  }

  /** Read a pinned snapshot. */
  def readVersion(spark: SparkSession, root: String, version: Long): DataFrame =
    spark.read.parquet(s"$root/v=$version")

  /** Read the latest published snapshot. */
  def readLatest(spark: SparkSession, root: String): DataFrame = {
    val v = latestVersion(root).getOrElse(
      throw new IllegalStateException(s"no published version under $root"))
    readVersion(spark, root, v)
  }
}
