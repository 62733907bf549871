package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VecMath

/** IVF-PQ: the classic composition of the two index legs — IVF
  * ([[IvfIndex]]) prunes WHICH lists are scanned, PQ ([[PqIndex]])
  * makes each scanned row 32× smaller and scores it by table lookup
  * (ADC) instead of a full dot product. This is the configuration a
  * 100 TB deployment actually runs: the coded frame (vec_id, list_id,
  * codes, vnorm) is the whole hot working set — ~24 bytes/vector,
  * partitioned by list_id — full vectors live cold in the store and
  * are touched ONLY by the final shortlist re-rank join.
  *
  * Both underlying indexes are build-once-memoized, and the coded
  * frame is their equi-join on vec_id registered through
  * [[graft.Caches]] (canonical-plan dedup: repeated searches and both
  * bench passes hit one materialization). At scale the join is a
  * one-time co-partitioned write, not a per-query step.
  *
  * Recall decomposes multiplicatively: probing P of k lists bounds it
  * by IVF's probe recall (P=4 → 0.80 measured, IvfRecallSpec), and the
  * ADC shortlist inside the probed lists is near-exact at
  * shortlist=64 (PqRecallSpec: flat-PQ recall 1.00). Measured composed
  * recall@3 on the sf0.001 fixture at the defaults: see IvfPqSpec,
  * floor pinned there.
  */
object IvfPq {

  private def codedFrame(spark: SparkSession, sfDir: String): DataFrame = {
    val ivf = IvfIndex.build(spark, sfDir)
    val pq = PqIndex.build(spark, sfDir)
    graft.Caches.persist(
      ivf.assigned.select(col("vec_id"), col("list_id"))
        .join(pq.codes, Seq("vec_id")))
  }

  def search(spark: SparkSession, sfDir: String, queries: DataFrame,
      nProbe: Int = 4, shortlist: Int = 64, topK: Int = 3): DataFrame = {
    val ivf = IvfIndex.build(spark, sfDir)
    val pq = PqIndex.build(spark, sfDir)
    val coded = codedFrame(spark, sfDir)

    // probe the P nearest centroid lists (same ranking IvfIndex.search
    // uses: centroid inner product, deterministic list_id tiebreak)
    val probeW = Window.partitionBy("query_id")
      .orderBy(col("cdist").asc, col("list_id"))
    val probed = queries.crossJoin(broadcast(ivf.centroids))
      .withColumn("cdist", -VecMath.dot(col("qv"), col("centroid")))
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= nProbe)
      .select(col("query_id"), col("qv"),
        PqIndex.lutFor(pq, col("qv")).as("lut"),
        VecMath.l2norm(col("qv")).as("qnorm"), col("list_id"))

    // ADC-score ONLY the probed lists' code rows
    val scored = coded.join(broadcast(probed), Seq("list_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("approx_cos",
        PqIndex.adcIp(col("lut"), col("codes")) / (col("qnorm") * col("vnorm")))
    val sw = Window.partitionBy("query_id")
      .orderBy(col("approx_cos").desc, col("vec_id"))
    val short = scored.withColumn("sr", row_number().over(sw))
      .filter(col("sr") <= shortlist)
      .select("query_id", "qv", "vec_id")

    // late materialization: shortlist ids against the full vectors
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), VecMath.asDouble(col("embedding")).as("v"))
    val exact = short.join(emb, Seq("vec_id"))
      .withColumn("cos", VecMath.cosine(col("qv"), col("v")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    exact.withColumn("rn", row_number().over(w)).filter(col("rn") <= topK)
      .select(col("query_id"), col("rn"), col("vec_id"),
        round(col("cos"), 6).as("cos"))
      .orderBy("query_id", "rn")
  }

  def searchTopK(spark: SparkSession, sfDir: String, nProbe: Int = 4,
      shortlist: Int = 64, topK: Int = 3): DataFrame = {
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), VecMath.asDouble(col("embedding")).as("v"))
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    search(spark, sfDir, queries, nProbe, shortlist, topK)
  }
}
