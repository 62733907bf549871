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

  test("http heartbeat GETs msg+ping params; transport failures are swallowed") {
    import java.net.InetSocketAddress
    import com.sun.net.httpserver.HttpServer
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/beat", ex => {
      seen.add(ex.getRequestURI.getQuery)
      ex.sendResponseHeaders(200, -1); ex.close()
    })
    server.start()
    val url = s"http://127.0.0.1:${server.getAddress.getPort}/beat"
    val l = HeartbeatListener.installHttp(spark, url)
    try {
      Seq(1, 2).toDF("x").count()
      val deadline = System.nanoTime() + 10e9.toLong
      while (seen.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      assert(!seen.isEmpty, "no heartbeat arrived")
      val q = seen.peek()
      assert(q.startsWith("msg=OK&ping="), s"unexpected query: $q")
    } finally { spark.listenerManager.unregister(l); server.stop(0) }

    // dead endpoint: the pipeline must keep running (reference swallows)
    val dead = HeartbeatListener.installHttp(spark, "http://127.0.0.1:1/beat")
    try {
      Seq(1).toDF("x").count()
      // successes increments BEFORE publish runs, so poll the publish
      // failure counter itself
      val deadline = System.nanoTime() + 10e9.toLong
      while (dead.publishFailures.get() == 0 && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(dead.successes.get() >= 1) // query completed despite outage
      assert(dead.publishFailures.get() >= 1)
    } finally spark.listenerManager.unregister(dead)
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

  test("MetricsCapture sees write-command metrics; first delivery wins") {
    import org.apache.spark.sql.functions._
    val cap = graft.streaming.Observe.capture(spark)
    try {
      // a batch WRITE is the case metricsOf can't reach (the executing
      // QueryExecution is the writer's own) — the capture must see it
      val name = "cap_" + java.util.UUID.randomUUID().toString.take(8)
      val out = java.nio.file.Files.createTempDirectory("graft_cap").toString
      spark.range(10).toDF("id")
        .observe(name, count(lit(1)).as("n"))
        .write.parquet(s"$out/t")
      assert(cap.await(name).getLong(0) === 10L)
      // first-write-wins: a later action re-reporting the same name
      // (as cached observe nodes do on every cache scan) must not
      // overwrite the materializing action's value
      spark.range(3).toDF("id")
        .observe(name, count(lit(1)).as("n")).collect()
      Thread.sleep(500) // let the second event drain through the bus
      assert(cap.await(name).getLong(0) === 10L)
    } finally graft.streaming.Observe.release(spark, cap)
  }
}
