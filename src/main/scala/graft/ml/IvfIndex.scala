package graft.ml

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VecMath

/** IVF (inverted-file) ANN index: MLlib KMeans coarse quantizer assigns
  * every vector to a centroid list; a query probes only its nProbe
  * nearest lists. The scale path alongside the hyperplane-LSH variant
  * (ExtensionQueries.x06): at 100 TB the centroid id is the partition
  * key, k grows with corpus size (k ≈ sqrt(N)), and the centroid table
  * (k × dim) broadcasts.
  *
  * Deterministic: fixed seed, fixed init; not SQL-expressible (KMeans),
  * so the query entry is declared rows-only.
  */
object IvfIndex {

  def searchTopK(spark: SparkSession, sfDir: String, k: Int = 16,
      nProbe: Int = 2, topK: Int = 3): DataFrame = {
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), VecMath.asDouble(col("embedding")).as("v"))
      .withColumn("features", array_to_vector(col("v")))
    val model = new KMeans().setK(k).setSeed(42L).setMaxIter(10)
      .setFeaturesCol("features").setPredictionCol("list_id")
      .fit(emb)
    val assigned = model.transform(emb).select("vec_id", "v", "list_id")

    // centroid dimension table (k rows) — broadcast by construction
    val centroids = model.clusterCenters.zipWithIndex.map {
      case (c: Vector, i: Int) => (i, c.toArray.toSeq)
    }.toIndexedSeq
    import spark.implicits._
    val centDf = centroids.toDF("list_id", "centroid")

    // queries probe their nProbe nearest centroid lists
    val queries = assigned.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val probeW = Window.partitionBy("query_id")
      .orderBy(col("cdist").asc, col("list_id"))
    val probed = queries.crossJoin(broadcast(centDf))
      .withColumn("cdist", -VecMath.dot(col("qv"), col("centroid")))
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= nProbe)
      .select("query_id", "qv", "list_id")

    // scan only the probed lists
    val scored = assigned.join(probed, Seq("list_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", VecMath.cosine(col("qv"), col("v")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= topK)
      .select(col("query_id"), col("rn"), col("vec_id"), col("list_id"),
        round(col("cos"), 6).as("cos"))
      .orderBy("query_id", "rn")
  }
}
