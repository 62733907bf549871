package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PrefixSum

/** PrefixSum is the distributed twin of the un-partitioned running-sum
  * window (which plans to ONE task); the answer must not depend on how
  * the input happens to be partitioned.
  */
class PrefixSumSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("exclusive prefix sum equals the sequential scan across partitionings") {
    val data = (1L to 500L).map(i => (i, (i * 37) % 11))
    val sorted = data.sortBy(_._1)
    val expect = sorted.map(_._1)
      .zip(sorted.map(_._2).scanLeft(0L)(_ + _)).toMap // exclusive: offset before row
    for (parts <- Seq(1, 3, 8)) {
      val df = data.toDF("k", "v").repartition(parts)
      val got = PrefixSum.withPrefixSum(df, "v", "ps", col("k"))
        .select("k", "ps").as[(Long, Long)].collect().toMap
      assert(got === expect, s"parts=$parts")
    }
  }

  test("order column may differ from the value column; first row gets 0") {
    // descending order by k: prefix sums accumulate in REVERSE key order
    val df = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
    val got = PrefixSum.withPrefixSum(df, "v", "ps", col("k").desc)
      .select("k", "ps").as[(Long, Long)].collect().toMap
    assert(got === Map(3L -> 0L, 2L -> 30L, 1L -> 50L))
  }

  test("existing output column is rejected") {
    val df = Seq((1L, 2L)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      PrefixSum.withPrefixSum(df, "v", "v", col("k"))
    }
  }
}
