package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{FreqExpressions, KllExpressions, ThetaExpressions}

/** Mergeable corpus-statistics artifacts: per-slice sketch tables
  * published through [[VersionedStore]] and merged on read.
  *
  * The problem at 100 TB: "how many distinct users per event type" or
  * "the p50 document length" rescans the whole corpus every time
  * someone asks, and an arriving ingest batch invalidates yesterday's
  * answer. The sketch-table shape fixes both ends:
  *
  *   - each corpus slice (a source, a day, an ingest batch) aggregates
  *     ONCE into a row of mergeable sketches — HLL for distinct counts
  *     (Spark's built-in DataSketches functions), KLL for quantiles
  *     (`functions.KllExpressions`), plus exact additive counters;
  *   - the slice tables are published as [[VersionedStore]] versions —
  *     one version per batch, immutable, kilobytes each;
  *   - a stats reader UNIONS the sketch rows (`hll_union_agg` /
  *     `kll_merge_agg` / `sum`) — cost proportional to the number of
  *     slices, never to corpus rows. A new batch = sketch the batch,
  *     publish, done; no historical row is ever re-read.
  *
  * Estimates carry the sketches' published error bounds (HLL lgK=12
  * ≈ 1.6% RSE; KLL k=200 ≈ 1.65% rank error — SketchSpec pins both
  * against the exact x34/x43 queries). Sketch columns carry a type
  * suffix (`_hll`, `_kll`) so [[merge]] can re-aggregate any sketch
  * table from its schema alone.
  */
object SketchStore {

  private val HllSuffix = "_hll"
  private val KllSuffix = "_kll"
  private val FreqSuffix = "_freq"
  private val ThetaSuffix = "_theta"

  /** Aggregate `df` into one sketch row per `keys` combination:
    * `n_rows` (exact), an HLL sketch per `distinctCols` entry, a KLL
    * sketch per `quantileCols` entry, a frequent-items sketch per
    * `freqCols` entry, a theta sketch per `setCols` entry (distincts
    * that also support cross-slice intersection/difference estimates —
    * release-overlap questions). Distinct-count, frequency, and set
    * inputs are cast to string (one canonical binding for any input
    * type); quantile inputs cast to double.
    */
  def sketchTable(df: DataFrame, keys: Seq[String],
      distinctCols: Seq[String], quantileCols: Seq[String],
      freqCols: Seq[String] = Nil, setCols: Seq[String] = Nil,
      lgK: Int = 12, kllK: Int = KllExpressions.DefaultK,
      freqMapSize: Int = FreqExpressions.DefaultMapSize): DataFrame = {
    val aggs =
      Seq(count(lit(1)).as("n_rows")) ++
        distinctCols.map(c =>
          hll_sketch_agg(col(c).cast("string"), lgK).as(c + HllSuffix)) ++
        quantileCols.map(c =>
          KllExpressions.kll_agg(col(c).cast("double"), kllK).as(c + KllSuffix)) ++
        freqCols.map(c =>
          FreqExpressions.freq_agg(col(c).cast("string"), freqMapSize)
            .as(c + FreqSuffix)) ++
        setCols.map(c =>
          ThetaExpressions.theta_agg(col(c).cast("string"), lgK)
            .as(c + ThetaSuffix))
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge sketch tables of the same shape back to one row per key:
    * counters add, HLL sketches union, KLL sketches merge,
    * frequent-items sketches merge. The result is again a sketch
    * table — merges compose associatively, so batch-of-batches rollups
    * are free. `freqMapSize` must match the size the tables were built
    * with (the merge TARGET's map governs merged accuracy).
    */
  def merge(tables: Seq[DataFrame], keys: Seq[String],
      freqMapSize: Int = FreqExpressions.DefaultMapSize): DataFrame = {
    require(tables.nonEmpty, "merge needs at least one sketch table")
    val all = tables.reduce(_.unionByName(_))
    val aggs = all.schema.fields.toSeq.collect {
      case f if f.name == "n_rows" => sum(col(f.name)).as(f.name)
      case f if f.name.endsWith(HllSuffix) =>
        hll_union_agg(col(f.name)).as(f.name)
      case f if f.name.endsWith(KllSuffix) =>
        KllExpressions.kll_merge_agg(col(f.name)).as(f.name)
      case f if f.name.endsWith(FreqSuffix) =>
        FreqExpressions.freq_merge_agg(col(f.name), freqMapSize).as(f.name)
      case f if f.name.endsWith(ThetaSuffix) =>
        ThetaExpressions.theta_union_agg(col(f.name)).as(f.name)
    }
    all.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Publish one batch's sketch table as the next immutable version,
    * then stamp it as a COMPLETE slice. Unlike a data snapshot, a
    * version here is one SLICE, not the whole corpus — [[mergedStats]]
    * combines all stamped slices.
    *
    * The stamp exists because "contiguous versions 0..latest" is NOT a
    * valid slice listing: a publish that crashes between its parquet
    * write and the `_latest` marker leaves an orphan `v=N` whose
    * content the RETRY republishes as `v=N+1` — a reader that swept
    * every directory would count that batch twice (or trip over a
    * half-written parquet). A slice is merge-eligible only once its
    * data AND the version marker landed; a crash before the stamp
    * means the batch replays (the streaming caller's per-batch
    * idempotence), and the unstamped orphan is permanently ignored.
    */
  def publishBatch(table: DataFrame, root: String): Long = {
    val v = VersionedStore.publish(table, root)
    val ok = new org.apache.hadoop.fs.Path(root, s"v=$v/$SliceOkMarker")
    val fs = ok.getFileSystem(
      table.sparkSession.sparkContext.hadoopConfiguration)
    fs.create(ok, true).close()
    v
  }

  private val SliceOkMarker = "_graft_slice_ok"

  /** The whole-corpus sketch table: every COMPLETE published slice
    * merged on read (unstamped orphans from crashed publishes are
    * skipped — see [[publishBatch]]). Scans only the kilobyte sketch
    * parquet under `root` — never a corpus row (SketchSpec pins the
    * plan).
    */
  def mergedStats(spark: SparkSession, root: String, keys: Seq[String],
      freqMapSize: Int = FreqExpressions.DefaultMapSize): DataFrame = {
    val slices = stampedSlices(spark, root)
    if (slices.isEmpty) throw new IllegalStateException(
      s"no published sketch batches under $root")
    merge(slices.map(v => VersionedStore.readVersion(spark, root, v)),
      keys, freqMapSize)
  }

  /** Compact every stamped slice into ONE: publish their merge as the
    * next slice, then retire exactly the inputs that were merged.
    * Lossless by the merge's associativity — a reader computes the
    * same union either way — and bounded: a store that ingested ten
    * thousand batches reads one slice again afterwards. Batches
    * arriving DURING the compaction are untouched (only the slices
    * listed before the merge are retired); concurrent READERS of the
    * retired slices are the one race — run compaction from the ingest
    * owner, like VersionedStore.vacuum. Returns the new slice version.
    */
  def compact(spark: SparkSession, root: String, keys: Seq[String],
      freqMapSize: Int = FreqExpressions.DefaultMapSize): Long = {
    val old = stampedSlices(spark, root)
    if (old.isEmpty) throw new IllegalStateException(
      s"no published sketch batches under $root")
    val merged = merge(old.map(v => VersionedStore.readVersion(spark, root, v)),
      keys, freqMapSize)
    // materialize BEFORE publishing: the merge plan reads the slices
    // being retired, and publishBatch's write must not race its own
    // input deletion on a lazily-evaluated frame
    val v = publishBatch(merged.localCheckpoint(true), root)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    old.foreach(o =>
      fs.delete(new org.apache.hadoop.fs.Path(root, s"v=$o"), true))
    v
  }

  private def stampedSlices(spark: SparkSession, root: String): Seq[Long] = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath)) Seq.empty[Long]
    else fs.listStatus(rootPath).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .filter(s => fs.exists(new org.apache.hadoop.fs.Path(s.getPath, SliceOkMarker)))
      .flatMap(s => scala.util.Try(
        s.getPath.getName.stripPrefix("v=").toLong).toOption)
      .sorted
  }
}
