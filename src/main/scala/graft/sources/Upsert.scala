package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Upsert sinks (SURVEY.md S8-S10).
  *
  * The reference upserts via MongoDB `bulk_write(UpdateOne(..., $set))`
  * (`worker.py:87-94,122-124`, `enter_wordvecs.py:40-53`,
  * `calculate_idf_scores.py:82-85`) — per-key merge semantics. Plain
  * Spark-on-Parquet has no MERGE, so the engine provides merge-by-join:
  * new rows win per key, non-updated columns survive via coalesce. At
  * 100 TB the same recipe runs per partition (dynamic partition
  * overwrite) so a batch only rewrites the partitions it touches.
  */
object Upsert {

  /** Merge `updates` into `existing` by `key`: update rows replace
    * matching keys, unmatched update rows are inserts, unmatched existing
    * rows survive. Row-presence (not per-value) dispatch: when an update
    * row matches, its value wins even when that value is NULL — matching
    * Mongo `$set` (the reference stores `doc_vectors=None` for
    * `known_tokens == 0`, `worker.py:87-94`; a per-value coalesce could
    * never write that NULL back). Columns absent from `updates`
    * entirely keep their existing value.
    */
  def mergeByKey(existing: DataFrame, updates: DataFrame, key: String): DataFrame = {
    val e = existing.alias("e")
    // Row presence is tracked with an explicit always-true marker, NOT
    // the update key's null-ness: a NULL-key update row never joins
    // (null === null is false), and key-based dispatch would then read
    // every shared column from the absent e-side, erasing the row's
    // real values into NULLs. With the marker, such a row surfaces as
    // an insert carrying its own values.
    // marker name must be free in BOTH frames: an input column named
    // __graft_upd would be silently overwritten by withColumn (and the
    // output column set would change), so probe for an unused suffix
    val marker = Iterator.from(0)
      .map(i => if (i == 0) "__graft_upd" else s"__graft_upd$i")
      .find(m => !existing.columns.contains(m) && !updates.columns.contains(m))
      .get
    val u = updates.withColumn(marker, lit(true)).alias("u")
    val joined = e.join(u, col(s"e.$key") === col(s"u.$key"), "full_outer")
    val updatePresent = col(s"u.$marker").isNotNull
    val cols = (existing.columns ++ updates.columns).distinct.map { c =>
      val inE = existing.columns.contains(c)
      val inU = updates.columns.contains(c)
      val expr =
        if (inE && inU) when(updatePresent, col(s"u.$c")).otherwise(col(s"e.$c"))
        else if (inU) col(s"u.$c")
        else col(s"e.$c")
      expr.as(c)
    }
    joined.select(cols.toIndexedSeq: _*)
  }

  /** Idempotent overwrite-by-key to a parquet target (the harness-side
    * sink; exactly-once = checkpointed source + this idempotent write).
    */
  def overwriteParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** Partition-targeted MERGE: [[mergeByKey]] semantics against a
    * partitioned parquet table, rewriting ONLY the partitions the
    * update batch touches. This is the write model a
    * continuously-upserting 100 TB store actually needs — the
    * reference's whole write model is per-key upserts
    * (`worker.py:87-94`); at warehouse scale those land in
    * day/range-partitioned storage, and a batch must not rewrite
    * history it never touched (the full-outer-join + full-rewrite
    * [[mergeByKey]]+[[overwriteParquet]] path does exactly that).
    *
    * Steps: (1) collect the batch's distinct partition values — bounded
    * and tiny, a batch touches few partitions, never data-sized;
    * (2) read the existing table WITH that partition filter, so
    * partition pruning keeps untouched directories entirely unscanned;
    * (3) [[mergeByKey]] within the touched slice; (4) write back with
    * per-write dynamic partition overwrite
    * (`option("partitionOverwriteMode","dynamic")` — no session-global
    * conf mutation), which replaces only the directories the merged
    * batch contains rows for.
    *
    * `partCol` must be stable per `key` — it is part of the record's
    * identity. An update that moved a key to a different partition
    * value would leave the old partition's row in place (the old
    * partition is, by design, never read or rewritten).
    *
    * The merged slice is materialized before the write because the
    * write replaces directories its own lazy plan reads from; the
    * CALLER picks the [[Materialize]] strategy because the right one
    * is a property of the deployment, not of the merge (round-5
    * ADVICE: a hard-coded `localCheckpoint` silently carries
    * executor-loss corruption risk onto real clusters).
    */
  def mergeByKeyPartitioned(path: String, updates: DataFrame, key: String,
      partCol: String, materialize: Materialize = Materialize.Local): Unit = {
    val spark = updates.sparkSession
    val vals = updates.select(partCol).distinct().collect().map(_.get(0)).toSeq
    require(!vals.contains(null),
      s"update batch has rows with NULL $partCol: partition-targeted merge " +
        "needs every row to name its partition")
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val merged =
      if (!fs.exists(p)) updates
      else mergeByKey(
        spark.read.parquet(path).filter(col(partCol).isin(vals: _*)),
        updates, key)
    def writeBack(pinned: DataFrame): Unit =
      pinned.write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partCol)
        .parquet(path)
    // per-invocation token: concurrent merges to ONE table must not
    // share a staging path (round-7 verdict #2 — the fixed
    // `<path>__graft_stage` name collided)
    val token = java.util.UUID.randomUUID().toString.take(8)
    materialize match {
      case Materialize.Local =>
        // localCheckpoint blocks live on executors: if one dies while
        // the overwrite below is in flight, recomputation falls back to
        // the lineage — which reads the directories being replaced.
        // Loud failure here beats silent corruption there.
        require(!spark.conf.getOption("spark.dynamicAllocation.enabled")
            .contains("true"),
          "Materialize.Local is unsafe with dynamic executor allocation " +
            "(released executors drop checkpoint blocks mid-write); use " +
            "Materialize.Reliable(dir) or Materialize.Stage")
        writeBack(merged.localCheckpoint(eager = true))
      case Materialize.Reliable(dir) =>
        stageAndWrite(merged,
          new org.apache.hadoop.fs.Path(dir, s"graft_stage_$token"), writeBack)
      case Materialize.Stage =>
        stageAndWrite(merged,
          new org.apache.hadoop.fs.Path(s"${path}__graft_stage_$token"),
          writeBack)
    }
  }

  /** Stage `merged` as parquet under `stage` (a durable-FS directory),
    * hand the re-read — lineage severed from the table being
    * overwritten — to `write`, and ALWAYS delete the stage, also on
    * failure (round-7 verdict #2: a success-only delete leaked the
    * staging directory on any failed overwrite). Parquet staging is
    * also how Reliable materializes now: the previous RDD
    * `checkpoint()` clobbered any session checkpoint dir via
    * `setCheckpointDir` and its `rdd-*` directories were never
    * cleaned without `spark.cleaner.referenceTracking.cleanCheckpoints`
    * (round-7 verdict #3); a parquet stage on the same durable root
    * has the identical fault-tolerance — survives executor loss, no
    * lineage back to the target — with scoped cleanup and no session
    * mutation.
    */
  private def stageAndWrite(merged: DataFrame,
      stage: org.apache.hadoop.fs.Path, write: DataFrame => Unit): Unit = {
    val spark = merged.sparkSession
    val sfs = stage.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      merged.write.mode(SaveMode.Overwrite).parquet(stage.toString)
      write(spark.read.parquet(stage.toString))
    } finally {
      // a failed cleanup must not REPLACE the primary failure — if the
      // durable FS is down, the write's exception is the root cause
      // the operator needs, and the orphaned stage dir is the lesser
      // problem (its unique suffix keeps it from colliding with
      // retries)
      try sfs.delete(stage, true)
      catch {
        case e: Exception => System.err.println(
          s"[upsert] stage cleanup of $stage failed: ${e.getMessage}")
      }
      ()
    }
  }
}

/** Materialization strategy for [[Upsert.mergeByKeyPartitioned]]'s
  * read-modify-overwrite cycle.
  */
sealed trait Materialize
object Materialize {
  /** `localCheckpoint` to executor storage — cheapest, correct on
    * local[n] and static-executor clusters; REFUSED (loudly) under
    * dynamic allocation.
    */
  case object Local extends Materialize

  /** Stage the merged slice as parquet under `dir` on a durable
    * cluster FS — survives executor loss; right for long-lived
    * clusters with a durable scratch root. The staging subdirectory
    * is per-invocation and deleted after the write (also on failure);
    * the session's checkpoint configuration is never touched.
    */
  final case class Reliable(dir: String) extends Materialize

  /** Stage the merged slice to `<path>__graft_stage_<token>` as
    * parquet, re-read it, overwrite, delete the stage (also on
    * failure) — fault-tolerant with no scratch-dir configuration, at
    * the cost of one extra write of the touched slice (never the
    * whole table). The per-invocation token keeps concurrent merges
    * to one table from sharing a staging path.
    */
  case object Stage extends Materialize
}
