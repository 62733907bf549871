package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Total-order contiguous rank WITHOUT a single-partition window.
  *
  * `row_number().over(Window.orderBy(...))` with no partitionBy collapses
  * the whole input into one task — fine at 31 vocab rows, a 2M-row
  * single-task sort at the reference's real vocabulary. The scalable
  * shape: range-sort (Spark's global orderBy already gives a total order
  * across partitions), then `RDD.zipWithIndex`, which computes
  * per-partition offsets with one lightweight count job and assigns
  * global contiguous 0-based indexes in parallel.
  */
object GlobalRank {

  /** Appends `rankCol` (LongType, 0-based, dense, in `order` order). */
  def withRank(df: DataFrame, rankCol: String, order: Column*): DataFrame = {
    require(!df.columns.contains(rankCol), s"column $rankCol already exists")
    val sorted = df.orderBy(order: _*)
    val schema = sorted.schema.add(rankCol, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    sorted.sparkSession.createDataFrame(rdd, schema)
  }
}
