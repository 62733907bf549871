package graft.streaming

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.queries.ReferenceQueries

/** Continuous idf maintenance — the streaming form of the reference's
  * periodic `calculate_idf_scores.py` job (and of the batch x52 merge).
  *
  * Each micro-batch contributes ASSOCIATIVE state — vocab tokens,
  * qualifying-post count, per-token occurrence counts — which folds
  * into a parquet state store by pure set-union / scalar-add /
  * counts-by-key-sum; history is never re-tokenized. `currentIdf`
  * materializes the serving table from state on demand through the
  * same reference formula the batch queries use, so the streamed
  * result is bit-identical to a full recompute (IdfStreamSpec pins
  * that against the oracle-checked q11).
  *
  * At 100 TB: per-batch work is proportional to the BATCH (tokenize +
  * one shuffle), the state store is vocabulary-sized (not corpus-
  * sized), and the checkpointed file source gives exactly-once state
  * accumulation — the swap-write makes replayed batches idempotent at
  * the store level only if the batch was fully applied, which the
  * checkpoint guarantees (offsets commit after foreachBatch returns).
  */
object IdfStream {

  /** Start the maintainer: stream docs from `docsDir`, fold state into
    * `stateDir/{vocab,n,occ}`. One file per micro-batch so multi-batch
    * accumulation is actually exercised.
    */
  def start(spark: SparkSession, docsDir: String, stateDir: String,
      checkpoint: String): StreamingQuery = {
    val docs = spark.readStream.schema(VectorizeStream.docSchema)
      .option("maxFilesPerTrigger", 1).parquet(docsDir)
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val (vocab, n, occ) = ReferenceQueries.idfBatchState(batch)
        fold(spark, vocab, s"$stateDir/vocab", _.distinct())
        fold(spark, n, s"$stateDir/n", identity)
        fold(spark, occ, s"$stateDir/occ",
          _.groupBy("token").sum("c").withColumnRenamed("sum(c)", "c"))
      }
      .start()
  }

  /** The serving idf table from current state (q11's exact shape). */
  def currentIdf(spark: SparkSession, stateDir: String): DataFrame =
    ReferenceQueries.idfFromState(
      spark.read.parquet(s"$stateDir/vocab"),
      spark.read.parquet(s"$stateDir/n"),
      spark.read.parquet(s"$stateDir/occ"))

  /** Merge a batch contribution into a parquet state path: union with
    * existing, re-reduce, swap-write (a parquet dir can't be
    * overwritten while being read).
    */
  private def fold(spark: SparkSession, update: DataFrame, path: String,
      reduce: DataFrame => DataFrame): Unit = {
    val p = Paths.get(path)
    val merged =
      if (Files.exists(p)) reduce(spark.read.parquet(path).unionByName(update))
      else reduce(update)
    val tmp = path + ".tmp"
    merged.write.mode("overwrite").parquet(tmp)
    deleteRecursively(p)
    Files.move(Paths.get(tmp), p)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
}
