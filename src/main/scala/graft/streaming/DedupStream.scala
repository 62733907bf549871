package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.queries.{ExtensionQueries, ReferenceQueries}

/** The always-on ingest the reference's worker actually is
  * (`worker.py:139-150`: poll, process the batch, mark it done, loop)
  * — WITH the near-dedup gate a production corpus needs in that loop:
  * each micro-batch drops near-duplicates against everything already
  * accepted BEFORE vectorizing, so duplicate text never costs
  * tokenize+join+axpy work and never reaches the training store.
  *
  * This composes x60's incremental shape into the streaming loop. The
  * accepted corpus's LSH band postings are a maintained artifact —
  * nothing re-tokenizes or re-minhashes history when a batch lands:
  *
  *   - `postings/batch=N/` — (doc_id, band, sig) of every ACCEPTED
  *     doc, written once when its batch was processed. Candidate
  *     generation per batch is batch-bands x postings — O(batch) band
  *     probes against an indexed artifact, never O(corpus^2) and
  *     never a corpus re-scan.
  *   - `docs/batch=N/` — (doc_id, text) of every accepted doc. Read
  *     ONLY through a left-semi join against the candidate hist-id
  *     frame: exact verification re-shingles the handful of history
  *     docs a candidate pair touches, not the corpus.
  *   - `vectors/` — the same merged doc-vector store VectorizeStream
  *     maintains, now fed survivors only.
  *
  * Exactly-once: checkpointed file-source offsets make each input
  * file process once per checkpoint lineage, and every per-batch write
  * is idempotent — postings/docs land in a `batch=N` directory that a
  * replayed batch OVERWRITES (same batch id, same content), and the
  * vector store is merge-by-key. A replayed batch must also see the
  * same history it saw the first time, so history reads anti-join the
  * current batch's ids: a crash between the postings write and the
  * vector write would otherwise replay the batch against its own
  * half-written postings and resolve new-vs-new ties as new-vs-history
  * (dropping the wrong side).
  *
  * Drop policy (arrival order is canonical, matching the Pipeline's
  * anti-join shape): a batch doc that pairs with an accepted history
  * doc drops; of a within-batch pair, the higher doc_id drops. Dropped
  * docs leave NO trace in the artifacts — later batches dedup against
  * survivors, exactly like the Pipeline's survivor-only banding.
  */
object DedupStream {

  private[streaming] val bandSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("band", IntegerType),
    StructField("sig", StringType)))

  private[streaming] val keptDocSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  /** The eval-contamination gate in its STREAMING shape: built once at
    * stream start, applied per micro-batch. This is exactly why the
    * bloom leg exists (functions/BloomExpressions): a per-batch gate
    * that broadcast-joined the full eval-gram set would re-ship the
    * hash relation every batch and stop working the day the benchmark
    * suite outgrows a broadcast; the once-built filter rides the
    * executors for the stream's lifetime, each micro-batch probes it
    * inside codegen, and only bloom survivors (~fpp of clean grams)
    * pay the exact semi-join against the persisted gram frame.
    *
    * `ev` is persisted by [[contamGateOf]]; callers release the gate
    * when the stream is done.
    */
  final case class ContamGate private[streaming] (
      ev: DataFrame,
      bloom: org.apache.spark.broadcast.Broadcast[
        org.apache.spark.util.sketch.BloomFilter],
      threshold: Double) {
    def release(): Unit = { ev.unpersist(false); bloom.destroy() }
  }

  /** Build the gate from the benchmark corpus (Pipeline stage-5 rule:
    * a doc sharing >= threshold of its distinct 8-grams with the eval
    * set is contaminated and never reaches the training store).
    */
  def contamGateOf(spark: SparkSession, evalDocs: DataFrame,
      threshold: Double = 0.5): ContamGate = {
    val ev = ExtensionQueries
      .docShingles(evalDocs, 8, persistShared = false)
      .select("shingle").distinct().persist()
    ContamGate(ev, ExtensionQueries.evalBloomOf(spark, ev), threshold)
  }

  /** Stream docs from `docsDir`; per micro-batch drop near-dups
    * against the accepted corpus (and, when a [[ContamGate]] is
    * given, eval-contaminated docs), then vectorize survivors — every
    * language, against the (lang, token)-keyed dimension table — into
    * `storeRoot/vectors`.
    */
  def start(spark: SparkSession, docsDir: String, wordvecsLang: DataFrame,
      dim: Int, storeRoot: String, checkpoint: String,
      gate: Option[ContamGate] = None): StreamingQuery = {
    val docs = spark.readStream.schema(VectorizeStream.docSchema).parquet(docsDir)
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(spark, batch.select("doc_id", "text", "lang"), batchId,
          wordvecsLang, dim, storeRoot, gate)
      }
      .start()
  }

  /** One micro-batch: dedup against history, persist the survivors'
    * artifacts idempotently, vectorize survivors.
    */
  private[streaming] def processBatch(spark: SparkSession, batch: DataFrame,
      batchId: Long, wordvecsLang: DataFrame, dim: Int,
      storeRoot: String, gate: Option[ContamGate] = None): Unit = {
    val batchDocs = batch.persist()
    try {
      val batchIds = batchDocs.select("doc_id")
      // replay safety: a re-run batch subtracts itself from history
      // (its own ids are unique stream-wide, so the anti-join restores
      // exactly the pre-batch state)
      val histBands = readOrEmpty(spark, s"$storeRoot/postings", bandSchema)
        .select("doc_id", "band", "sig")
        .join(broadcast(batchIds), Seq("doc_id"), "left_anti")
      val histDocs = readOrEmpty(spark, s"$storeRoot/docs", keptDocSchema)
        .select("doc_id", "text")
        .join(broadcast(batchIds), Seq("doc_id"), "left_anti")
      val sh = ExtensionQueries.docShingles(batchDocs, persistShared = false)
        .persist()
      val batchBands = ExtensionQueries.bandsOf(sh).persist()
      try {
        val (drops, cand) = dropsOf(sh, batchBands, histBands, histDocs)
        try {
          val dedupSurvivors = batchDocs
            .join(drops, Seq("doc_id"), "left_anti")
          // contamination gate AFTER dedup (the Pipeline's stage
          // order — only dedup survivors pay the 8-gram projection).
          // Contaminated docs leave NO trace in the artifacts, like
          // dup losers: the published corpus is what later batches
          // dedup against, and a contaminated doc must not become
          // anyone's canonical. Gate-branch persists: the dedup
          // anti-join feeds both the 8-gram projection and the final
          // anti-join's left side, and contaminationWithBloom scans
          // sh8 twice (totals + bloom hits) — unpersisted, the
          // expensive shingle projection and the drops join would
          // re-plan per consumer in the hot ingest loop.
          var gateCaches: Seq[DataFrame] = Nil
          val survivors = (gate match {
            case None => dedupSurvivors
            case Some(g) =>
              val ds = dedupSurvivors.persist()
              val sh8 = ExtensionQueries.docShingles(
                ds, 8, persistShared = false).persist()
              gateCaches = Seq(ds, sh8)
              val flagged = ExtensionQueries
                .contaminationWithBloom(sh8, g.ev, g.bloom, g.threshold)
                .filter(col("flagged"))
                .select("doc_id")
              ds.join(flagged, Seq("doc_id"), "left_anti")
          }).persist()
          try {
            batchBands
              .join(survivors.select("doc_id"), Seq("doc_id"), "left_semi")
              .write.mode(SaveMode.Overwrite)
              .parquet(s"$storeRoot/postings/batch=$batchId")
            survivors.write.mode(SaveMode.Overwrite)
              .parquet(s"$storeRoot/docs/batch=$batchId")
            // live corpus stats: the batch's survivors sketched once
            // (per-lang token total, distinct-token HLL, heavy-token
            // sketch) into their own idempotent batch slice —
            // [[corpusStats]] merges the kilobyte slices on read, so
            // "what's in the corpus so far" never rescans accepted
            // text. Per-language tokenization, matching the vectorize
            // below — the stats must describe the tokens that train.
            graft.sources.SketchStore.vocabStats(
              survivors.select("lang", "text"))
              .write.mode(SaveMode.Overwrite)
              .parquet(s"$storeRoot/stats/batch=$batchId")
            val vecs = ReferenceQueries
              .docVectorsByLang(survivors, wordvecsLang, dim)
              .select("doc_id", "lang", "known_ratio", "vec")
            VectorizeStream.upsertStore(spark, vecs, s"$storeRoot/vectors")
          } finally {
            survivors.unpersist()
            gateCaches.foreach(_.unpersist(false))
          }
        } finally cand.unpersist()
      } finally { batchBands.unpersist(); sh.unpersist() }
    } finally batchDocs.unpersist()
  }

  /** The per-batch dedup core — split out so the spec can pin both
    * its answer (equality with a batch replay of the x02 core under
    * the cross-measure verify) and its PLAN (history enters as the
    * postings artifact and a candidate-pruned docs read; the corpus
    * is never re-banded or re-read).
    *
    * The candidate join scans the postings artifact linearly — but
    * that is ~20 bytes/doc of (doc_id, band, sig), not the text: the
    * expensive tokenize+minhash work happens only on the batch. At
    * warehouse scale the artifact would additionally be bucketed by
    * (band, sig) so the probe co-locates without a shuffle — here it
    * is batch-appended and the equi-join shuffles both (small) sides.
    *
    * History text enters ONLY through a left-semi join against the
    * candidate hist-id frame: the candidate set is O(batch ×
    * band-collisions) in normal operation but UNBOUNDED under a bulk
    * backfill or a hot band signature, so it must never become a
    * driver-side list (the pre-r9 shape collected the ids into an
    * `isin` — driver memory pressure plus a giant `In` literal
    * compiled into the plan; the semi-join's dynamic candidate frame
    * delivers the same pruning as a join).
    *
    * Verification applies the CROSS-MEASURE dup predicate
    * (`ExtensionQueries.dupEdgePred`: Jaccard >= 0.5 OR containment
    * overlap >= 0.9 with the min-evidence floor) — the same drop rule
    * the Pipeline's x72 closure prunes on, so the always-on ingest
    * and the batch snapshot agree on what counts as a duplicate.
    * Honest scope note: candidates still come from minhash banding,
    * whose collision probability is the Jaccard — the containment leg
    * upgrades near-half-overlap excerpt pairs that banding DOES
    * surface; a tiny excerpt inside a huge accepted doc (low Jaccard)
    * needs the inverted-index channel the batch Pipeline runs.
    *
    * Returns (drop ids, candidate handle). The tagged candidate frame
    * is scanned three times (historical-id semi-join, pair
    * verification, drop attribution), so it is persisted here and
    * MUST be unpersisted by the caller — same contract as
    * [[graft.Pipeline.dupEdgesOf]].
    */
  private[graft] def dropsOf(batchSh: DataFrame, batchBands: DataFrame,
      histBands: DataFrame, histDocs: DataFrame): (DataFrame, DataFrame) = {
    val bNew = batchBands.select(col("doc_id").as("dn"), col("band"), col("sig"))
    val bHist = histBands.select(col("doc_id").as("da"), col("band"), col("sig"))
      .withColumn("da_new", lit(false))
    val bSelf = batchBands.select(col("doc_id").as("da"), col("band"), col("sig"))
      .withColumn("da_new", lit(true))
    // one tagged candidate row per (unordered pair): who drops if the
    // pair verifies, and which side needs history shingles. A
    // within-batch pair surfaces from both directions of the band
    // join; least/greatest + distinct collapses it (both directions
    // agree: the higher id drops).
    val tagged = bNew.join(bSelf.unionByName(bHist), Seq("band", "sig"))
      .filter(col("dn") =!= col("da"))
      .select(
        least(col("dn"), col("da")).as("d1"),
        greatest(col("dn"), col("da")).as("d2"),
        when(col("da_new"), greatest(col("dn"), col("da")))
          .otherwise(col("dn")).as("drop_id"),
        when(col("da_new"), lit(null).cast("long"))
          .otherwise(col("da")).as("hist_id"))
      .distinct()
      .persist()
    // exact verify needs shingles for both sides: the batch's are
    // already in hand; history's are re-shingled for ONLY the
    // candidate docs — a left-semi join against the candidate hist-id
    // frame keeps the text read candidate-sized without ever listing
    // ids on the driver
    val histIds = tagged.select(col("hist_id").as("doc_id"))
      .filter(col("doc_id").isNotNull).distinct()
    val histSh = ExtensionQueries.docShingles(
      histDocs.join(histIds, Seq("doc_id"), "left_semi"),
      persistShared = false)
    val verified = ExtensionQueries.dupVerifiedOf(
      tagged.select("d1", "d2").distinct(), batchSh.unionByName(histSh))
    val drops = verified.join(tagged, Seq("d1", "d2"))
      .select(col("drop_id").as("doc_id")).distinct()
    (drops, tagged)
  }

  private[streaming] val statsSchema: StructType = StructType(Seq(
    StructField("lang", StringType), StructField("n_rows", LongType),
    StructField("token_hll", BinaryType), StructField("token_freq", BinaryType),
    StructField("token_theta", BinaryType)))

  /** Live whole-corpus vocabulary stats from the maintained per-batch
    * slices: one merged sketch row per language — token total,
    * distinct-token HLL, heavy-token sketch, token theta sketch (the
    * SAME schema as the Pipeline snapshot's stats table, so live
    * ingest stats and release stats union and set-op against each
    * other). Cost is O(accepted batches) kilobyte rows; the accepted
    * text is never rescanned (each batch sketched itself once, in its
    * own loop).
    */
  def corpusStats(spark: SparkSession, storeRoot: String): DataFrame =
    graft.sources.SketchStore.merge(
      Seq(readOrEmpty(spark, s"$storeRoot/stats", statsSchema)
        .select("lang", "n_rows", "token_hll", "token_freq", "token_theta")),
      Seq("lang"))

  private def readOrEmpty(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.parquet(path)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
  }
}
