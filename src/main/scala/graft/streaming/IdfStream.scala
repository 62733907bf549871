package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.queries.ReferenceQueries

/** Continuous idf maintenance — the streaming form of the reference's
  * periodic `calculate_idf_scores.py` job (and of the batch x52 merge).
  *
  * Each micro-batch contributes ASSOCIATIVE state — vocab tokens,
  * qualifying-post count, per-token occurrence counts — written as an
  * APPEND-ONLY per-batch delta directory (`state/batch=<id>/…`) with a
  * `_done` marker committed last. Append-only is what makes replay
  * exactly-once: foreachBatch is at-least-once, and a replayed batch
  * simply overwrites its own delta with identical deterministic
  * content before re-marking it — no read-modify-write fold exists to
  * double-count, and a crash at ANY point leaves either a complete
  * marked delta or an unmarked one the replay rewrites. `currentIdf`
  * reduces across all marked deltas through the same reference
  * formula the batch queries use, so the streamed result is
  * bit-identical to a full recompute (IdfStreamSpec pins that against
  * the oracle-checked q11).
  *
  * At 100 TB: per-batch work is proportional to the BATCH (tokenize +
  * one shuffle), each delta is vocabulary-sized, and serving reads
  * reduce over #batches deltas — compact old deltas into one (the
  * merge is the same associative union) when the batch count grows.
  * All metadata I/O goes through the Hadoop FileSystem of the state
  * path, so the store works wherever the parquet does.
  */
object IdfStream {

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Start the maintainer: stream docs from `docsDir`, write one delta
    * per micro-batch under `stateDir`. One file per micro-batch so
    * multi-batch accumulation is actually exercised.
    */
  def start(spark: SparkSession, docsDir: String, stateDir: String,
      checkpoint: String): StreamingQuery = {
    val docs = spark.readStream.schema(VectorizeStream.docSchema)
      .option("maxFilesPerTrigger", 1).parquet(docsDir)
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val dir = s"$stateDir/batch=$id"
        val (vocab, n, occ) = ReferenceQueries.idfBatchState(batch)
        // overwrite, not errorifexists: a replayed batch regenerates
        // the identical delta, and a half-written delta from a crash
        // is simply rewritten before the marker goes back down
        vocab.write.mode("overwrite").parquet(s"$dir/vocab")
        n.write.mode("overwrite").parquet(s"$dir/n")
        occ.write.mode("overwrite").parquet(s"$dir/occ")
        val fs = fsOf(batch.sparkSession, dir)
        fs.create(new Path(dir, "_done"), true).close()
      }
      .start()
  }

  /** Completed (marked) batch delta directories under `stateDir`. */
  private def doneBatches(spark: SparkSession, stateDir: String): Seq[String] = {
    val root = new Path(stateDir)
    val fs = fsOf(spark, stateDir)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
      .filter(st => fs.exists(new Path(st.getPath, "_done")))
      .map(_.getPath.toString)
  }

  /** The serving idf table from all completed deltas (q11's shape). */
  def currentIdf(spark: SparkSession, stateDir: String): DataFrame = {
    val dirs = doneBatches(spark, stateDir)
    require(dirs.nonEmpty, s"no completed idf state under $stateDir")
    def readAll(part: String): DataFrame =
      dirs.map(d => spark.read.parquet(s"$d/$part")).reduce(_.unionByName(_))
    ReferenceQueries.idfFromState(
      readAll("vocab"), readAll("n"), readAll("occ"))
  }
}
