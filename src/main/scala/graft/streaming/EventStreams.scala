package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming forms of the reference's unbounded poller
  * (SURVEY.md §2.10, `worker.py:139-150`).
  *
  * The reference tracks progress by mutating a per-row job flag and
  * re-scanning (`worker.py:92,99`); the Spark-native equivalent is
  * checkpointed source offsets — the scan predicate disappears and
  * delivery becomes exactly-once with an idempotent sink. Tests drive
  * these with the memory sink + `processAllAvailable()`.
  */
object EventStreams {

  /** Streaming source over a DIRECTORY of events parquet files.
    * FileStreamSource requires an explicit schema, and the generated
    * data has shipped two `ts` vintages (TIMESTAMP(NANOS) read as long
    * under `nanosAsLong`; TIMESTAMP(MICROS) unadjusted read as
    * TIMESTAMP_NTZ) — so the on-disk type is probed with a one-shot
    * batch schema read of the same directory (metadata only, no data
    * scan) and normalized exactly like Tables.events. Declaring one
    * vintage's schema against the other's files silently misreads the
    * raw int64 (micros DIV 1000 ⇒ instants 1000× too early) — caught
    * by StreamingSpec's stream≡batch equivalences the day the
    * generator switched vintages. An EMPTY / not-yet-populated
    * directory can't be probed (no footers to infer from); fall back
    * to the current generator's vintage (micros-NTZ) so the stream
    * can still be STARTED before the first file lands — the probe is
    * a read-time refinement, not a start-time requirement.
    */
  def eventStream(spark: SparkSession, eventsDir: String): DataFrame = {
    val tsType =
      try spark.read.parquet(eventsDir).schema("ts").dataType
      catch { case _: org.apache.spark.sql.AnalysisException =>
        TimestampNTZType }
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", tsType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val raw = spark.readStream.schema(schema).parquet(eventsDir)
    tsType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** Watermarked tumbling-window aggregation — the streaming twin of
    * ExtensionQueries.x11_event_windows (same window spec; batch mode is
    * the oracle-checked path).
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("w_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Stream-stream inner join with watermarks: each click joins the
    * same user's views from the preceding 30 minutes. Both sides carry
    * watermarks AND the join condition carries a time bound — the two
    * things Structured Streaming needs to evict join state; without
    * them the buffered sides grow forever. Batch-mode execution of the
    * same plan is the spec oracle.
    */
  def clicksAfterViews(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", "1 hour")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    clicks.join(views,
      expr("""v_user = c_user AND
              view_ts < click_ts AND
              view_ts >= click_ts - INTERVAL 30 MINUTES"""))
      .select(col("c_user").as("user_id"), col("click_id"), col("view_id"),
        col("click_ts"), col("view_ts"))
  }

  /** Streaming exact dedup: duplicate event_ids arriving within the
    * watermark horizon are dropped; dedup state is bounded by the
    * watermark (unbounded-state `dropDuplicates` would grow forever on
    * an infinite stream — this is the 100 TB-safe form). The batch twin
    * is x01-style hash dedup.
    */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  case class Ev(user_id: Long, us: Long)
  case class Session(user_id: Long, session_id: Long, n_events: Long,
      sess_start_us: Long, sess_end_us: Long)

  /** Stateful sessionization via flatMapGroupsWithState — the custom-
    * state path (gap 30 min, mirrors x12_sessionize's batch semantics
    * when all data arrives; events are sorted in-group because state
    * functions receive an unordered iterator).
    */
  def sessionize(spark: SparkSession, events: DataFrame): Dataset[Session] = {
    import spark.implicits._
    val evs = events.select(col("user_id"), expr("unix_micros(ts)").as("us")).as[Ev]
    evs.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[Session], Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[Ev], state: GroupState[List[Session]]) =>
          val gap = 1800L * 1000000L
          val sorted = it.map(_.us).toArray.sorted
          var sessions = List.empty[Session]
          var sid = 0L
          var start = 0L
          var end = 0L
          var n = 0L
          sorted.foreach { us =>
            if (n == 0L || us - end > gap) {
              if (n > 0) sessions ::= Session(uid, sid, n, start, end)
              sid += 1; start = us; n = 0
            }
            end = us; n += 1
          }
          if (n > 0) sessions ::= Session(uid, sid, n, start, end)
          sessions.reverseIterator
      }
  }
}
