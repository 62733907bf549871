package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bucketing, SkewJoin}

class OperatorsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain join's rows on skewed data") {
    // 90% of probe rows share one hot key
    val probe = (1 to 2000).map(i =>
      (if (i % 10 == 0) i.toLong % 50 else 7L, s"p$i")).toDF("k", "pv")
    val build = (0L to 49L).map(k => (k, s"b$k")).toDF("k", "bv")
    val plain = probe.join(build, Seq("k")).select("k", "pv", "bv")
      .collect().map(_.toSeq).sortBy(_.toString)
    val salted = SkewJoin.saltedJoin(probe, build, "k", 8)
      .select("k", "pv", "bv").collect().map(_.toSeq).sortBy(_.toString)
    assert(salted === plain)
  }

  test("bucketed-by-key join plans without a shuffle exchange") {
    val left = (1L to 1000L).map(i => (i, s"l$i")).toDF("k", "lv")
    val right = (1L to 1000L).map(i => (i, s"r$i")).toDF("k", "rv")
    Bucketing.writeBucketed(left, "graft_bl", "k", 4)
    Bucketing.writeBucketed(right, "graft_br", "k", 4)
    // force a non-broadcast join so the assertion targets the shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.table(spark, "graft_bl")
        .join(Bucketing.table(spark, "graft_br"), Seq("k"))
        .filter(col("k") <= 500)
      assert(joined.count() === 500)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
