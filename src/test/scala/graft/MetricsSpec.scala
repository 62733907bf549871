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

  test("observe() counters ride the existing pass over documents") {
    val docs = Tables.documents(spark, sf)
    val observed = graft.streaming.Observe.documentQuality(docs, "doc_quality")
    // collect() executes THIS frame's QueryExecution (count() would plan
    // a separate aggregate query whose observation lives elsewhere)
    val total = observed.collect().length.toLong
    val m = graft.streaming.Observe.metricsOf(observed, "doc_quality")
    assert(m.nonEmpty, "observation not recorded")
    assert(m.get.getAs[Long]("n_rows") === total)
    assert(m.get.getAs[Long]("n_empty_text") === 0)
    assert(m.get.getAs[Long]("n_null_lang") === 0)
  }
}
