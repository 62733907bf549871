package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BloomExpressions
import graft.queries.ExtensionQueries

/** The bloom membership leg (functions/BloomExpressions) and its
  * shipped composition, the non-broadcast contamination gate (x67).
  */
class BloomSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def buildBytes(items: Seq[String], parts: Int,
      expected: Long = 4096, fpp: Double = 0.01): Array[Byte] =
    items.toDF("s").repartition(parts)
      .agg(BloomExpressions.bloom_agg(col("s"), expected, fpp).as("bf"))
      .head().getAs[Array[Byte]](0)

  test("bloom filter has no false negatives and a bounded FP rate") {
    val inserted = (0 until 2000).map(i => s"gram-$i")
    val bloom = spark.sparkContext.broadcast(
      BloomExpressions.read(buildBytes(inserted, 5)))
    // every inserted key probes true — bloom filters cannot miss
    val hits = inserted.toDF("s")
      .filter(BloomExpressions.bloom_might_contain(col("s"), bloom))
      .count()
    assert(hits === 2000L)
    // fresh keys probe true only at ~fpp; allow 5x slack on 4000 draws
    val fresh = (0 until 4000).map(i => s"absent-$i")
    val fps = fresh.toDF("s")
      .filter(BloomExpressions.bloom_might_contain(col("s"), bloom))
      .count()
    assert(fps <= (5 * 0.01 * 4000).toLong,
      s"false-positive rate blew the 5x-fpp bound: $fps/4000")
  }

  test("merged bits are byte-identical under any partitioning") {
    // OR-merge is commutative+associative and partial filters share
    // geometry, so the DISTRIBUTED build must equal the 1-partition
    // build bit for bit — the property that makes the agg mergeable
    val items = (0 until 1000).map(i => f"k$i%07d")
    val one = buildBytes(items, 1)
    val many = buildBytes(items, 7)
    assert(java.util.Arrays.equals(one, many))
  }

  test("x67 bloom contamination equals x51's broadcast shape row-for-row") {
    val a = ExtensionQueries.x51_contamination(spark, sf)
      .collect().map(_.toSeq)
    val b = ExtensionQueries.x67_contam_bloom(spark, sf)
      .collect().map(_.toSeq)
    assert(a.nonEmpty)
    assert(a.toSeq === b.toSeq)
  }

  test("graft_bloom_agg is SQL-callable and probe-compatible") {
    graft.functions.GraftFunctions.register(spark)
    spark.createDataset(Seq("a", "b", "c")).toDF("s")
      .createOrReplaceTempView("bloom_in")
    val bytes = spark.sql(
      "SELECT graft_bloom_agg(s, 100L, 0.01) AS bf FROM bloom_in")
      .head().getAs[Array[Byte]](0)
    val bf = BloomExpressions.read(bytes)
    // same UTF-8-bytes contract as the Column build path
    assert(bf.mightContainBinary("a".getBytes("UTF-8")))
    assert(bf.mightContainBinary("b".getBytes("UTF-8")))
  }
}
