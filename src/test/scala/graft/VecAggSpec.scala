package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.agg.VecAgg

class VecAggSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("weighted vector sum matches sequential fold across partitionings") {
    val rnd = new scala.util.Random(7)
    val dim = 5
    val rows = (1 to 500).map { i =>
      (i % 7L, rnd.nextDouble(), Seq.fill(dim)(rnd.nextDouble()))
    }
    val expected: Map[Long, Seq[Double]] = rows.groupBy(_._1).map {
      case (g, rs) =>
        g -> rs.foldLeft(Array.fill(dim)(0.0)) { (acc, r) =>
          var i = 0
          while (i < dim) { acc(i) += r._2 * r._3(i); i += 1 }
          acc
        }.toSeq
    }
    for (parts <- Seq(1, 3, 8)) {
      val got = rows.toDF("g", "w", "vec").repartition(parts)
        .groupBy("g").agg(VecAgg.weightedSum(dim)(col("w"), col("vec")).as("v"))
        .as[(Long, Seq[Double])].collect().toMap
      assert(got.keySet === expected.keySet)
      for ((g, v) <- got; i <- 0 until dim)
        assert(math.abs(v(i) - expected(g)(i)) < 1e-9,
          s"group $g dim $i parts $parts")
    }
  }

  test("empty groups produce no rows; zero-length input gives zero vector") {
    val got = Seq((1L, 0.5, Seq(1.0, 2.0)))
      .toDF("g", "w", "vec").filter(col("g") > 100)
      .groupBy("g").agg(VecAgg.weightedSum(2)(col("w"), col("vec")))
    assert(got.count() === 0)
  }

  test("shorter vectors than dim contribute to their prefix only") {
    val got = Seq((1L, 1.0, Seq(3.0)))
      .toDF("g", "w", "vec")
      .groupBy("g").agg(VecAgg.weightedSum(3)(col("w"), col("vec")).as("v"))
      .as[(Long, Seq[Double])].head()
    assert(got._2 === Seq(3.0, 0.0, 0.0))
  }
}
