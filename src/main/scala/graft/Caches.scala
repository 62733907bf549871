package graft

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.storage.StorageLevel

/** Registry for the session-lifetime shared caches (docTokens,
  * docShingles, the x04 verified-pair set, x51's 8-gram posting — see
  * SCALE.md §caching). The caches themselves are ordinary
  * `DataFrame.persist` entries deduped by Spark's CacheManager; what was
  * missing (round-3 ADVICE, round-4 verdict #5) is a RELEASE hook: in a
  * long-lived server that touches many datasets, every dataset pins its
  * posting tables forever. `clear(sfDir)` unpersists exactly the frames
  * whose plans read from that dataset's files, so one dataset can be
  * evicted without disturbing the others' warm caches.
  *
  * Keyed by canonicalized logical plan, mirroring CacheManager's own
  * dedup: re-persisting an equivalent plan (every x04 call re-creates
  * the frame) registers one entry, not one per call.
  */
object Caches {

  private val reg = new ConcurrentHashMap[LogicalPlan, DataFrame]()

  /** Persist `df` (MEMORY_AND_DISK — degrades to spill, not OOM) and
    * register it for targeted release. Returns the REGISTERED frame:
    * when an equivalent plan is already pinned (every x04 call
    * re-creates the frame), the caller gets the first frame back and
    * no second `persist()` runs — persisting before checking re-marked
    * the plan in CacheManager and spammed "Asked to cache already
    * cached data" on every warm call (round-5 verdict #6).
    */
  def persist(df: DataFrame): DataFrame =
    reg.computeIfAbsent(df.queryExecution.analyzed.canonicalized, _ => {
      df.persist(StorageLevel.MEMORY_AND_DISK)
      df
    })

  /** Checkpoint an ITERATIVE, corpus-sized frame. `localCheckpoint`
    * (the default) truncates lineage into executor-local, UNREPLICATED
    * storage — free at local[32], but on a real cluster an executor
    * loss mid-iteration fails the job instead of recomputing (round-17
    * verdict #4). When `spark.graft.checkpointDir` (or the
    * SPARK_GRAFT_CHECKPOINT_DIR env) names a reliable store, the
    * iterative paths (closure propagation, PageRank, label
    * propagation) write real checkpoints there instead. Rows are
    * identical either way — only the storage/recovery contract moves.
    */
  def iterCheckpoint(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val dir = spark.conf.getOption("spark.graft.checkpointDir")
      .orElse(sys.env.get("SPARK_GRAFT_CHECKPOINT_DIR"))
    dir match {
      case Some(d) =>
        if (spark.sparkContext.getCheckpointDir.isEmpty)
          spark.sparkContext.setCheckpointDir(d)
        df.checkpoint()
      case None => df.localCheckpoint(true)
    }
  }

  /** Scheme-less root paths of every file source in `df`'s plan. */
  private def sourceRoots(df: DataFrame): Seq[String] =
    df.queryExecution.analyzed.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toUri.getPath).toSeq
        case _ => Seq.empty[String]
      }
    }.flatten.distinct

  /** Scheme-less, trailing-slash-free form of a dataset path — the
    * normalization `clear(sfDir)` matches against; memo keys derived
    * from sfDir (closureMemo) must use the same form or a relative /
    * trailing-slash variant leaks past the release hook (round-17
    * ADVICE).
    */
  private[graft] def normalizePath(dir: String): String =
    new org.apache.hadoop.fs.Path(dir).toUri.getPath.stripSuffix("/")

  private def normalize(dir: String): String = normalizePath(dir)

  private def readsFrom(df: DataFrame, dir: String): Boolean = {
    val d = normalize(dir)
    sourceRoots(df).exists(r => r == d || r.startsWith(d + "/"))
  }

  /** Whether an equivalent plan is already registered — lets a
    * call-scoped persist/unpersist pair (QualityModel.fitAndScore's
    * default path) avoid tearing down a session cache someone else
    * registered for the same plan (CacheManager keys by canonical
    * plan, so THEIR unpersist would drop OUR entry's data).
    */
  def isRegistered(df: DataFrame): Boolean =
    reg.containsKey(df.queryExecution.analyzed.canonicalized)

  /** Registered cache entries whose plans read files under `sfDir`. */
  def registered(sfDir: String): Seq[DataFrame] =
    reg.values().asScala.toSeq.filter(readsFrom(_, sfDir))

  /** Unpersist (blocking) every registered cache reading from `sfDir`
    * and drop the dataset's memoized IVF indexes. Returns the number of
    * cache entries released. Safe to call while other datasets' caches
    * are live; safe to re-run the queries afterwards (they transparently
    * rebuild their caches on next use).
    */
  def clear(sfDir: String): Int = {
    val hit = reg.entrySet().asScala.toSeq
      .filter(e => readsFrom(e.getValue, sfDir))
    hit.foreach { e =>
      e.getValue.unpersist(blocking = true)
      reg.remove(e.getKey)
    }
    graft.ml.IvfIndex.clear(sfDir)
    graft.ml.IvfPq.clear(sfDir)
    graft.ml.Bm25Index.clear(sfDir)
    graft.ml.Whiten.clear(sfDir)
    graft.ml.WhitenedIvf.clear(sfDir)
    graft.ml.BitextAnn.clear(sfDir)
    graft.queries.ExtensionQueries.clearBpe(sfDir)
    graft.queries.ExtensionQueries.clearClosure(sfDir)
    hit.size
  }

  /** Release everything: all registered caches and all IVF indexes. */
  def clearAll(): Int = {
    val n = reg.size()
    reg.values().asScala.foreach(_.unpersist(blocking = true))
    reg.clear()
    graft.ml.IvfIndex.clear()
    graft.ml.IvfPq.clear()
    graft.ml.Bm25Index.clear()
    graft.ml.Whiten.clear(null)
    graft.ml.WhitenedIvf.clear(null)
    graft.ml.BitextAnn.clear(null)
    graft.queries.ExtensionQueries.clearBpe(null)
    graft.queries.ExtensionQueries.clearClosure(null)
    n
  }
}
