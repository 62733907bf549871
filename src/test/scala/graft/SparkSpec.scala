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
  /** Fixture root, overridable per-host (round-12 advice: suites must
    * not hardcode this machine's layout when they widen to other SFs).
    */
  val testdataRoot: String =
    sys.env.getOrElse("SPARK_GRAFT_TESTDATA", "/root/testdata")
  def sfDir(scale: String): String = s"$testdataRoot/sf$scale"
  val sf: String = sfDir("0.001")
}
