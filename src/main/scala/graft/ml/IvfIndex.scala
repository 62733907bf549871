package graft.ml

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.VecMath

/** IVF (inverted-file) ANN index: a coarse quantizer assigns every
  * vector to a centroid list; a query probes only its nProbe nearest
  * lists. The scale path alongside the hyperplane-LSH variant
  * (ExtensionQueries.x06): at 100 TB the centroid id is the partition
  * key, k grows with corpus size (k ≈ sqrt(N)), and the centroid table
  * (k × dim) broadcasts.
  *
  * Build and search are split — the honest IVF shape is "build once,
  * probe many" — and the built index is memoized per (session, sfDir,
  * k), so repeated searches (and both bench iterations) pay the build
  * exactly once. One index per dataset lives for the session, like the
  * shared posting table (SCALE.md §caches); `clear()` drops them.
  *
  * The quantizer is trained with local Lloyd's iterations on a BOUNDED
  * deterministic sample (k·256 vectors, FAISS-style: at 10^9 corpus
  * vectors you train k-means on a memory-sized sample, never the
  * corpus). An earlier MLlib-KMeans variant fit the full frame
  * distributed — ~15 Spark jobs of pure scheduler overhead at bench
  * scale and the wrong shape at 100 TB, where the corpus-wide pass you
  * actually want is the single broadcast-centroid ASSIGN below, not the
  * fit. Assignment stays fully distributed + codegen: a k×dim centroid
  * literal, one `transform`+`zip_with` dot-product pass per row, argmax
  * by `array_position` — O(N·k) flops, zero shuffle, no row blowup.
  *
  * Deterministic (xxhash64 sample, index-spread init, fixed iteration
  * count) but k-means isn't SQL-expressible, so the query entry is
  * declared rows-only; the accuracy contract is IvfRecallSpec.
  */
object IvfIndex {

  /** The built index: per-vector list assignments (persisted) and the
    * k-row centroid dimension table (broadcast by construction).
    */
  final case class Index(assigned: DataFrame, centroids: DataFrame)

  private val cache = new ConcurrentHashMap[(Int, String, Int), Index]()

  def build(spark: SparkSession, sfDir: String, k: Int = 16): Index = {
    val key = (System.identityHashCode(spark), sfDir, k)
    cache.computeIfAbsent(key, _ => buildIndex(spark, embFrame(spark, sfDir), k))
  }

  /** Build over an EXPLICIT (vec_id, v) frame — the space-agnostic
    * entry the stream-maintained index rides (a DedupStream store's
    * doc vectors are their own embedding space). Unmemoized: the
    * caller owns the returned index's persisted assignment frame
    * (release with `index.assigned.unpersist()`).
    */
  def buildFrom(spark: SparkSession, vecs: DataFrame, k: Int = 16): Index =
    buildIndex(spark, vecs, k)

  private def buildIndex(spark: SparkSession, emb: DataFrame, k: Int): Index = {
      // --- train: bounded deterministic sample, local Lloyd's ---
      val maxTrain = k * 256
      val sample = emb
        .orderBy(xxhash64(col("vec_id")), col("vec_id"))
        .limit(maxTrain) // TakeOrdered: one distributed top-N, ~2 MB collected
        .select("v").collect().map(_.getSeq[Double](0).toArray)
      val cents = lloyds(sample, k, iters = 20)

      // --- assign: distributed, broadcast centroids as literals ---
      // score_i = v·c_i − |c_i|²/2 (argmax ≡ Euclidean argmin); project
      // the scores array to an attribute first so the argmax doesn't
      // re-evaluate the k dot products (HOF args re-eval per call).
      val centLit = array(cents.map(c => array(c.map(lit(_)).toIndexedSeq: _*)).toIndexedSeq: _*)
      val offLit = array(cents.map(c => lit(0.5 * c.map(x => x * x).sum)).toIndexedSeq: _*)
      val scores = zip_with(transform(centLit, c => VecMath.dot(col("v"), c)),
        offLit, (d, o) => d - o)
      val assigned = emb
        .withColumn("scores", scores)
        .withColumn("list_id",
          (array_position(col("scores"), array_max(col("scores"))) - 1).cast("int"))
        .select("vec_id", "v", "list_id")
        .persist(StorageLevel.MEMORY_AND_DISK)

      import spark.implicits._
      Index(assigned, cents.toIndexedSeq.map(_.toSeq).zipWithIndex
        .map { case (c, i) => (i, c) }.toDF("list_id", "centroid"))
  }

  /** Publish a built index as a versioned on-disk artifact (round-4
    * verdict #2): at 100 TB you build ONCE and ship the artifact — the
    * reference's own wordvec store is exactly a persisted model table
    * (`enter_wordvecs.py:40-53`). Centroids + assignments go out as one
    * atomic multi-table snapshot, so a reader can never pair one
    * version's centroids with another's assignments. Returns the
    * published version.
    */
  def save(spark: SparkSession, sfDir: String, root: String, k: Int = 16): Long = {
    val ix = build(spark, sfDir, k)
    graft.sources.VersionedStore.publishAll(
      Map("centroids" -> ix.centroids, "assigned" -> ix.assigned), root)
  }

  /** Load a published index (the latest snapshot, or a pinned
    * `version`). The assignments are persisted through
    * [[graft.Caches]] — keyed by the artifact root, so
    * `Caches.clear(root)` releases a loaded index the same way
    * `clear(sfDir)` drops a built one. No k-means, no corpus scan: a
    * fresh session probes immediately.
    */
  def load(spark: SparkSession, root: String, version: Option[Long] = None): Index = {
    val v = version.orElse(graft.sources.VersionedStore.latestVersion(root))
      .getOrElse(throw new IllegalStateException(s"no published index under $root"))
    val assigned = graft.Caches.persist(
      graft.sources.VersionedStore.readTable(spark, root, v, "assigned"))
    Index(assigned, graft.sources.VersionedStore.readTable(spark, root, v, "centroids"))
  }

  /** Drop all built indexes (frees the persisted assignment frames). */
  def clear(): Unit = {
    cache.values().forEach(ix => { ix.assigned.unpersist(); () })
    cache.clear()
  }

  /** How many distinct indexes are memoized for a dataset — the
    * build-once pin for consumers that must not rebuild the quantizer
    * per run (PipelineSpec's semantic-dedup case asserts 1 after two
    * runs).
    */
  private[graft] def cachedCount(sfDir: String): Int = {
    import scala.jdk.CollectionConverters._
    cache.keySet().asScala.count(_._2 == sfDir)
  }

  /** Drop only the indexes built over one dataset — the per-dataset
    * eviction twin of [[graft.Caches.clear]].
    */
  def clear(sfDir: String): Unit = {
    import scala.jdk.CollectionConverters._
    cache.keySet().asScala.filter(_._2 == sfDir).toList.foreach { k =>
      val ix = cache.remove(k)
      if (ix != null) ix.assigned.unpersist()
    }
  }

  private def embFrame(spark: SparkSession, sfDir: String): DataFrame =
    graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), VecMath.asDouble(col("embedding")).as("v"))

  /** Plain Lloyd's over a driver-held sample. Deterministic: init picks
    * k index-spread points of the (hash-shuffled) sample; fixed
    * iteration budget; an emptied cluster reseeds to the point farthest
    * from its current centroid.
    */
  private[ml] def lloyds(points: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] = {
    require(points.length >= k, s"sample ${points.length} < k=$k")
    val dim = points.head.length
    var cents = Array.tabulate(k)(i => points((i.toLong * points.length / k).toInt).clone())

    def nearest(p: Array[Double]): Int = {
      var best = 0; var bestD = Double.MaxValue; var i = 0
      while (i < k) {
        var d = 0.0; var j = 0
        while (j < dim) { val t = p(j) - cents(i)(j); d += t * t; j += 1 }
        if (d < bestD) { bestD = d; best = i }
        i += 1
      }
      best
    }

    var it = 0
    var changed = true
    var assign = Array.fill(points.length)(-1)
    while (it < iters && changed) {
      changed = false
      val sums = Array.fill(k, dim)(0.0)
      val counts = Array.fill(k)(0)
      var p = 0
      while (p < points.length) {
        val a = nearest(points(p))
        if (a != assign(p)) { changed = true; assign(p) = a }
        var j = 0
        while (j < dim) { sums(a)(j) += points(p)(j); j += 1 }
        counts(a) += 1
        p += 1
      }
      cents = Array.tabulate(k) { i =>
        if (counts(i) > 0) sums(i).map(_ / counts(i))
        else { // reseed empty cluster: farthest point from its centroid
          val far = points.indices.maxBy { pi =>
            val c = cents(assign(pi)); var d = 0.0; var j = 0
            while (j < dim) { val t = points(pi)(j) - c(j); d += t * t; j += 1 }
            d
          }
          changed = true
          points(far).clone()
        }
      }
      it += 1
    }
    cents
  }

  /** Probe the nProbe nearest lists per query against a built index.
    *
    * Multi-probe is the recall lever (round-8 verdict #4): a query
    * near a Voronoi boundary has true neighbors in adjacent lists, so
    * single-probe recall is capped hard. Measured on the sf0.001
    * isotropic embeddings at k=16 (recall@3 vs brute-force x05):
    * P=1 → 0.33, P=2 → 0.40, P=4 → 0.80, P=6 → 0.93, P=8 → 1.00.
    * Default P=4 scans 1/4 of the lists for 0.8+ recall;
    * IvfRecallSpec pins that floor. Cost is linear in P (P list
    * scans per query), the FAISS-style knob a deployment tunes.
    */
  def search(index: Index, queries: DataFrame, nProbe: Int = 4,
      topK: Int = 3, topAvgK: Int = 0, withVec: Boolean = false): DataFrame = {
    val probeW = Window.partitionBy("query_id")
      .orderBy(col("cdist").asc, col("list_id"))
    val probed = queries.crossJoin(broadcast(index.centroids))
      .withColumn("cdist", -VecMath.dot(col("qv"), col("centroid")))
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= nProbe)
      .select("query_id", "qv", "list_id")

    // scan only the probed lists
    val scored = index.assigned.join(probed, Seq("list_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", VecMath.cosine(col("qv"), col("v")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    // cos is UNROUNDED here (round-14 advice): downstream margin
    // arithmetic (bitextMineAnn) must run on the same basis as the
    // exact truth leg; serving queries round at their own output
    // projection (the x144 convention — see searchTopK).
    val ranked = scored.withColumn("rn", row_number().over(w))
    // topAvgK > 0 additionally emits `topavg` — the per-query average
    // cos of the top-topAvgK neighbors — FUSED into the ranking window
    // stage (round-17 verdict ask #3: the margin normalizers ax/ay were
    // separate aggregate passes over the probe output; an unbounded
    // window over the same partitioning adds one WindowExec and ZERO
    // Exchanges, so the normalizer rides the probe's own stage). avg
    // ignores the when()-nulls, so the value equals the old
    // filter(rn<=K).groupBy.avg over the same rows.
    val withAvg =
      if (topAvgK <= 0) ranked
      else ranked.withColumn("topavg",
        avg(when(col("rn") <= topAvgK, col("cos")))
          .over(Window.partitionBy("query_id")))
    // withVec additionally emits the MATCHED vector `v` (already in
    // hand from the scored join): a consumer that re-probes from the
    // result set (the bitext reverse/normalizer legs) can then derive
    // its next query batch from the result rows instead of re-scanning
    // the whole persisted assigned frame to point-fetch vectors by id
    // — measured on warm x147, each such fetch was a full 29-32-task
    // cache scan (guide §2.4: remove the pass outright).
    val outCols = Seq(col("query_id"), col("rn"), col("vec_id"),
      col("list_id"), col("cos")) ++
      (if (topAvgK > 0) Seq(col("topavg")) else Nil) ++
      (if (withVec) Seq(col("v")) else Nil)
    withAvg.filter(col("rn") <= topK)
      .select(outCols: _*)
      .orderBy("query_id", "rn")
  }

  def searchTopK(spark: SparkSession, sfDir: String, k: Int = 16,
      nProbe: Int = 4, topK: Int = 3): DataFrame = {
    val index = build(spark, sfDir, k)
    val queries = index.assigned.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    // the SERVING projection rounds (x21's output contract); search
    // itself stays unrounded for margin arithmetic downstream
    search(index, queries, nProbe, topK)
      .withColumn("cos", round(col("cos"), 6))
  }
}
