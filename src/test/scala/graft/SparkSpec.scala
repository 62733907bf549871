package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for all suites (one JVM-wide session; suites
  * must not stop it).
  */
object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder().master("local[8]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkSpec {
  lazy val spark: SparkSession = SparkSpec.session
  /** `awaitTermination(timeout)` returns FALSE when the budget expires
    * with the query still running. Every streaming test used to ignore
    * that boolean, so under full-suite parallel load a 3-minute
    * timeout let the harness proceed to read artifacts the stream
    * never published — surfacing two asserts later as a misleading
    * PATH_NOT_FOUND (round-16's one committed failure,
    * DedupStreamSpec's contamination-gate test). This guard fails
    * loudly at the true cause instead; the larger default budget
    * absorbs box load without masking a genuine hang (a healthy
    * test-mode stream quiesces in seconds).
    */
  implicit class StreamQuiesce(q: org.apache.spark.sql.streaming.StreamingQuery) {
    def quiesce(timeoutMs: Long = 420000): Unit = {
      val done = q.awaitTermination(timeoutMs)
      if (!done) {
        try q.stop() catch { case _: Exception => () }
        throw new AssertionError(
          s"stream did not quiesce within ${timeoutMs}ms " +
            "(timed out mid-run; artifacts below would be partial)")
      }
    }
  }
  /** Fixture root, overridable per-host (round-12 advice: suites must
    * not hardcode this machine's layout when they widen to other SFs).
    */
  val testdataRoot: String =
    sys.env.getOrElse("SPARK_GRAFT_TESTDATA", "/root/testdata")
  def sfDir(scale: String): String = s"$testdataRoot/sf$scale"
  val sf: String = sfDir("0.001")
}
