package graft.streaming

import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Metrics sink (SURVEY.md S11).
  *
  * The reference emits an HTTP heartbeat with batch wall-clock per loop
  * (`worker.py:128-137,144`); the engine-native form is a
  * QueryExecutionListener publishing per-query duration + outcome
  * (swap [[publish]] for an HTTP push in a real deployment — the
  * listener is the operator, the transport is config).
  */
class HeartbeatListener extends QueryExecutionListener {
  val successes = new AtomicLong(0)
  val failures = new AtomicLong(0)
  val lastDurationNs = new AtomicLong(0)
  val lastError = new AtomicReference[String]("")

  protected def publish(msg: String, pingNs: Long): Unit = ()

  override def onSuccess(funcName: String, qe: QueryExecution,
      durationNs: Long): Unit = {
    successes.incrementAndGet()
    lastDurationNs.set(durationNs)
    publish("OK", durationNs)
  }

  override def onFailure(funcName: String, qe: QueryExecution,
      exception: Exception): Unit = {
    failures.incrementAndGet()
    lastError.set(exception.getMessage)
    publish("FAIL", 0L)
  }
}

object HeartbeatListener {
  def install(spark: SparkSession): HeartbeatListener = {
    val l = new HeartbeatListener
    spark.listenerManager.register(l)
    l
  }

  /** Install the HTTP-transport variant pushing to `url`. */
  def installHttp(spark: SparkSession, url: String): HttpHeartbeatListener = {
    val l = new HttpHeartbeatListener(url)
    spark.listenerManager.register(l)
    l
  }
}

/** The reference's actual heartbeat transport (`worker.py:128-137`):
  * `GET {url}?msg=OK&ping={elapsed_ms}` with failures SWALLOWED — a
  * monitoring outage must never take down the pipeline (the reference
  * prints and continues; here the failure is counted so tests and
  * operators can still see it).
  */
class HttpHeartbeatListener(url: String) extends HeartbeatListener {
  val publishFailures = new AtomicLong(0)

  @transient private lazy val client: java.net.http.HttpClient =
    java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(2)).build()

  override protected def publish(msg: String, pingNs: Long): Unit =
    try {
      val uri = java.net.URI.create(s"$url?msg=$msg&ping=${pingNs / 1000000}")
      // request timeout as well as connect: an endpoint that accepts
      // the connection but never answers must not wedge the listener
      // thread for every subsequent query
      client.send(java.net.http.HttpRequest.newBuilder(uri)
        .timeout(java.time.Duration.ofSeconds(2)).GET().build(),
        java.net.http.HttpResponse.BodyHandlers.discarding())
      ()
    } catch {
      case _: Exception => publishFailures.incrementAndGet(): Unit
    }
}

/** In-plan data-quality counters via `Dataset.observe` — the metrics
  * ride the existing pass over the data (zero extra jobs, exact even
  * under retries), surfaced through the same listener channel as the
  * heartbeat. The reference's only quality signal is the per-batch
  * `known_tokens_ratio` it writes per row (`worker.py:91`); observe()
  * is the aggregate, pipeline-level form.
  */
object Observe {
  import org.apache.spark.sql.{DataFrame, Row}
  import org.apache.spark.sql.functions._

  /** Attach row/null/empty-text counters to a documents-shaped frame
    * under the given observation name.
    */
  def documentQuality(df: DataFrame, name: String): DataFrame =
    df.observe(name,
      count(lit(1)).as("n_rows"),
      count(when(col("text").isNull || length(col("text")) === 0, 1))
        .as("n_empty_text"),
      count(when(col("lang").isNull, 1)).as("n_null_lang"))

  /** Collect the named observation after an action ran on the frame. */
  def metricsOf(df: DataFrame, name: String): Option[Row] = {
    val o = df.queryExecution.observedMetrics
    o.get(name)
  }

  /** Register a [[MetricsCapture]] on the session. Callers MUST
    * [[release]] it (try/finally) — the listener manager holds a strong
    * reference for the session lifetime otherwise.
    */
  def capture(spark: SparkSession): MetricsCapture = {
    val c = new MetricsCapture
    spark.listenerManager.register(c)
    c
  }

  def release(spark: SparkSession, c: MetricsCapture): Unit =
    spark.listenerManager.unregister(c)
}

/** Captures observed metrics from ANY action on the session — including
  * batch writes, where the executing QueryExecution is internal to the
  * writer and `Observe.metricsOf` can't reach it. Spark delivers
  * CollectMetrics through cached plans and AQE stages
  * (`CollectMetricsExec.collect` descends into
  * `InMemoryTableScanExec.relation.cachedPlan` and uses
  * AdaptiveSparkPlanHelper), so one capture sees a whole pipeline's
  * counters regardless of which action materialized each frame.
  * Delivery rides the async listener bus — hence [[await]], not a
  * plain get, after the triggering action returns.
  */
final class MetricsCapture extends QueryExecutionListener {
  import org.apache.spark.sql.Row

  private val seen = new java.util.concurrent.ConcurrentHashMap[String, Row]()

  // FIRST delivery wins: an observe node inside a cached plan is
  // re-reported by every later action that scans the cache, and its
  // accumulator can drift upward if lost cached partitions recompute —
  // the first event (the action that materialized the frame, bus order
  // is FIFO) carries the correct value, so later re-deliveries of the
  // same name must not overwrite it. Callers give each logical run its
  // own observation names; a reused name would otherwise pin the
  // previous run's value.
  override def onSuccess(funcName: String, qe: QueryExecution,
      durationNs: Long): Unit =
    qe.observedMetrics.foreach { case (name, row) =>
      seen.putIfAbsent(name, row); ()
    }

  override def onFailure(funcName: String, qe: QueryExecution,
      exception: Exception): Unit = ()

  def get(name: String): Option[Row] = Option(seen.get(name))

  /** Block until the named observation is delivered (the action that
    * computed it has already returned on the calling thread; this only
    * waits out listener-bus dispatch).
    */
  def await(name: String, timeoutMs: Long = 60000L): Row = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var r = seen.get(name)
    while (r == null && System.nanoTime() < deadline) {
      Thread.sleep(10)
      r = seen.get(name)
    }
    if (r == null) throw new IllegalStateException(
      s"observed metric '$name' not delivered within ${timeoutMs}ms")
    r
  }
}
