package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.HeartbeatListener

class MetricsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("heartbeat listener observes query completions with durations") {
    val l = HeartbeatListener.install(spark)
    try {
      Seq(1, 2, 3).toDF("x").count()
      // listener callbacks are async — poll briefly
      val deadline = System.nanoTime() + 10e9.toLong
      while (l.successes.get() == 0 && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(l.successes.get() >= 1)
      assert(l.lastDurationNs.get() > 0)
      assert(l.failures.get() === 0)
    } finally spark.listenerManager.unregister(l)
  }
}
