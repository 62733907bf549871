package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-partitioned) tables for shuffle-free co-located joins
  * — the storage-layout answer to "this join shuffles 100 TB every
  * run". Write once bucketed by the join key; every subsequent
  * equi-join on that key between same-bucket-count tables skips both
  * Exchanges.
  */
object Bucketing {
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)
}
