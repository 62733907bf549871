package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{FreqExpressions, KllExpressions, ThetaExpressions, Tokenize}

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

  /** The per-language vocabulary stats slice BOTH publishers share —
    * the Pipeline's snapshot stats table and the streaming ingest's
    * per-batch slices union and set-op against each other by
    * contract, so their shape must come from one definition, not two
    * call sites kept in sync by convention. Input: a documents frame
    * with `lang` and `text`; tokenization is the same per-language
    * rule the vectorizers use (stats must describe the tokens that
    * train).
    */
  def vocabStats(docs: DataFrame): DataFrame =
    sketchTable(
      docs.select(col("lang"),
        explode(Tokenize.tokensByLang(col("text"), col("lang"))).as("token")),
      Seq("lang"), Seq("token"), Nil, Seq("token"), Seq("token"))

  /** Merge sketch tables of the same shape back to one row per key:
    * counters add, HLL sketches union, KLL sketches merge,
    * frequent-items sketches merge, theta sketches union. The result
    * is again a sketch table — merges compose associatively, so
    * batch-of-batches rollups are free. `freqMapSize`, `lgK`, and `kllK`
    * must match the sizes the tables were built with: the merge
    * TARGETS govern merged accuracy (a default-sized theta union over
    * lgK=16 slices would silently cap them at 2^12 retained entries;
    * a default-k KLL target over k=800 slices degrades them to
    * k=200's rank error — DataSketches adopts the smallest k).
    */
  def merge(tables: Seq[DataFrame], keys: Seq[String],
      freqMapSize: Int = FreqExpressions.DefaultMapSize,
      lgK: Int = ThetaExpressions.DefaultLgK,
      kllK: Int = KllExpressions.DefaultK): DataFrame = {
    require(tables.nonEmpty, "merge needs at least one sketch table")
    val all = tables.reduce(_.unionByName(_))
    val aggs = all.schema.fields.toSeq.collect {
      case f if f.name == "n_rows" => sum(col(f.name)).as(f.name)
      case f if f.name.endsWith(HllSuffix) =>
        hll_union_agg(col(f.name)).as(f.name)
      case f if f.name.endsWith(KllSuffix) =>
        KllExpressions.kll_merge_agg(col(f.name), kllK).as(f.name)
      case f if f.name.endsWith(FreqSuffix) =>
        FreqExpressions.freq_merge_agg(col(f.name), freqMapSize).as(f.name)
      case f if f.name.endsWith(ThetaSuffix) =>
        ThetaExpressions.theta_union_agg(col(f.name), lgK).as(f.name)
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
    writeStamp(table.sparkSession, root, v, Set.empty)
    v
  }

  private val SliceOkMarker = "_graft_slice_ok"

  /** The stamp doubles as a RETIREMENT MANIFEST: a compacted slice
    * lists the versions it replaced (one per line; empty for a normal
    * batch slice). Readers subtract every manifested version from the
    * stamped set, so a compaction that crashed (or failed a delete)
    * between its stamp and its input deletions cannot double-count —
    * the leftovers are excluded the moment the merged slice is
    * stamped, deletion is only space reclamation.
    */
  private def writeStamp(spark: SparkSession, root: String, v: Long,
      retired: Set[Long]): Unit = {
    // temp-file + atomic rename, like VersionedStore.publishMarker: a
    // direct create+write can crash mid-stamp and leave a VISIBLE but
    // truncated manifest — the slice would read as complete with the
    // wrong (or no) retirement list, double-counting the inputs it
    // was meant to replace. With the rename, the marker either exists
    // complete or not at all.
    val conf = spark.sparkContext.hadoopConfiguration
    val ok = new org.apache.hadoop.fs.Path(root, s"v=$v/$SliceOkMarker")
    val tmp = new org.apache.hadoop.fs.Path(root, s"v=$v/$SliceOkMarker.tmp")
    val fs = ok.getFileSystem(conf)
    val out = fs.create(tmp, true)
    try out.write(retired.toSeq.sorted.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(fs.getUri, conf)
    fc.rename(fs.makeQualified(tmp), fs.makeQualified(ok),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** The whole-corpus sketch table: every COMPLETE published slice
    * merged on read (unstamped orphans from crashed publishes are
    * skipped — see [[publishBatch]]). Scans only the kilobyte sketch
    * parquet under `root` — never a corpus row (SketchSpec pins the
    * plan).
    */
  def mergedStats(spark: SparkSession, root: String, keys: Seq[String],
      freqMapSize: Int = FreqExpressions.DefaultMapSize,
      lgK: Int = ThetaExpressions.DefaultLgK,
      kllK: Int = KllExpressions.DefaultK): DataFrame = {
    val (slices, _) = sliceState(spark, root)
    if (slices.isEmpty) throw new IllegalStateException(
      s"no published sketch batches under $root")
    merge(slices.map(v => VersionedStore.readVersion(spark, root, v)),
      keys, freqMapSize, lgK, kllK)
  }

  /** Compact every live slice into ONE: publish their merge as the
    * next slice (stamped with the retirement manifest of its inputs),
    * then delete the inputs. Lossless by the merge's associativity —
    * a reader computes the same union either way — and bounded: a
    * store that ingested ten thousand batches reads one slice again
    * afterwards.
    *
    * Crash safety mirrors [[publishBatch]]'s: a crash before the
    * stamp leaves an ignored orphan and the originals intact; a crash
    * AFTER the stamp (or a failed delete) leaves leftovers that the
    * new slice's manifest permanently excludes — at no point can a
    * reader count a batch twice. The manifest carries forward any
    * previously-retired versions still on disk, so compacting a
    * compaction cannot resurrect an old leftover. Batches arriving
    * DURING the compaction are untouched (only the slices listed
    * before the merge are retired). Returns the new slice version.
    */
  def compact(spark: SparkSession, root: String, keys: Seq[String],
      freqMapSize: Int = FreqExpressions.DefaultMapSize,
      lgK: Int = ThetaExpressions.DefaultLgK,
      kllK: Int = KllExpressions.DefaultK): Long = {
    val (alive, retired) = sliceState(spark, root)
    if (alive.isEmpty) throw new IllegalStateException(
      s"no published sketch batches under $root")
    val merged = merge(alive.map(v => VersionedStore.readVersion(spark, root, v)),
      keys, freqMapSize, lgK, kllK)
    // No checkpoint needed: publish is an EAGER parquet write that
    // returns before the input deletions below run, so the lazy merge
    // plan can never observe its inputs deleted — and staying lazy
    // keeps the write recomputable if an executor dies mid-publish
    // (an eager localCheckpoint pinned to executor storage would make
    // that loss fatal instead).
    val v = VersionedStore.publish(merged, root)
    writeStamp(spark, root, v, alive.toSet ++ retired)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    alive.foreach(o =>
      fs.delete(new org.apache.hadoop.fs.Path(root, s"v=$o"), true))
    v
  }

  /** (live slice versions, every version retired by a manifest). A
    * slice is LIVE when it is stamped and no stamped slice's manifest
    * retires it.
    */
  private def sliceState(spark: SparkSession, root: String): (Seq[Long], Set[Long]) = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath)) return (Seq.empty, Set.empty)
    val stamped = fs.listStatus(rootPath).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .filter(s => fs.exists(new org.apache.hadoop.fs.Path(s.getPath, SliceOkMarker)))
      .flatMap(s => scala.util.Try(
        s.getPath.getName.stripPrefix("v=").toLong).toOption)
      .sorted
    val retired = stamped.flatMap { v =>
      val in = fs.open(new org.apache.hadoop.fs.Path(root, s"v=$v/$SliceOkMarker"))
      val txt = try {
        val out = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096, false)
        new String(out.toByteArray, "UTF-8")
      } finally in.close()
      txt.split("\n").flatMap(l => scala.util.Try(l.trim.toLong).toOption)
    }.toSet
    (stamped.filterNot(retired), retired)
  }
}
