package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Distributed EXCLUSIVE prefix sum in a total order — the running
  * `sum(...) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)` shape
  * WITHOUT the single-partition window it plans to (an un-partitioned
  * window collapses the corpus into one task — the same scale-killer
  * [[GlobalRank]] exists for).
  *
  * Scalable shape: range-sort (global total order across partitions),
  * one lightweight job collecting PER-PARTITION totals (numPartitions
  * longs on the driver — metadata, not data), broadcast their running
  * offsets, then each partition scans locally starting at its offset.
  * Two passes over the sorted lineage, like `zipWithIndex`'s internal
  * count; callers that already persist the input pay the sort twice at
  * most.
  */
object PrefixSum {

  /** Appends `outCol` = sum of `valueCol` (LongType) over all rows
    * STRICTLY BEFORE this one in `order` order (first row gets 0).
    */
  def withPrefixSum(df: DataFrame, valueCol: String, outCol: String,
      order: Column*): DataFrame = {
    require(!df.columns.contains(outCol), s"column $outCol already exists")
    val sorted = df.orderBy(order: _*)
    val idx = sorted.schema.fieldIndex(valueCol)
    // Both jobs below MUST see the same evaluation of the sorted
    // lineage: the totals job fixes each partition's offset, and the
    // row job applies it. An unpersisted lineage would be evaluated
    // twice, and a nondeterministic input (rand(), source files
    // changing between the jobs) would silently desync offsets from
    // rows (round-5 ADVICE). Persisting pins one materialization —
    // the totals collect below is also the job that populates the
    // cache. Release is automatic: once the caller drops the returned
    // frame, the pinned RDD is unreachable and Spark's ContextCleaner
    // unpersists its blocks. Residual caveat (same as zipWithIndex):
    // recomputation after executor loss still re-evaluates lineage.
    val sortedRdd = sorted.rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val partTotals = sortedRdd
      .mapPartitionsWithIndex { case (i, it) =>
        var s = 0L
        it.foreach(r => s += r.getLong(idx))
        Iterator.single(i -> s)
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = partTotals.scanLeft(0L)(_ + _) // offsets(i) = sum before partition i
    val bc = df.sparkSession.sparkContext.broadcast(offsets)
    val schema = sorted.schema.add(outCol, LongType, nullable = false)
    val out = sortedRdd.mapPartitionsWithIndex { case (i, it) =>
      var acc = bc.value(i)
      it.map { r =>
        val row = Row.fromSeq(r.toSeq :+ acc)
        acc += r.getLong(idx)
        row
      }
    }
    sorted.sparkSession.createDataFrame(out, schema)
  }
}
