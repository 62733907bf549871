package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** Source-layer robustness a production ingest needs: parquet schema
  * evolution across file generations, malformed-record quarantine on
  * JSON ingest, and the SQL form of the axpy UDAF.
  */
class SourceRobustnessSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("parquet mergeSchema unifies file generations; old files read NULL") {
    val dir = java.nio.file.Files.createTempDirectory("graft_evo").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.mode("append").parquet(dir)
    Seq((3L, "c", 9.5)).toDF("id", "name", "score")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.schema.fieldNames.sorted === Array("id", "name", "score"))
    val rows = merged.orderBy("id")
      .select(col("id"), col("score")).collect()
    assert(rows.map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSeq ===
      Seq((1L, None), (2L, None), (3L, Some(9.5))))
  }

  test("PERMISSIVE json ingest quarantines corrupt records instead of failing") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bad").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "data.json"),
      """{"id": 1, "v": 10.0}
        |{"id": 2 "v": BROKEN
        |{"id": 3, "v": 30.0}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType),
      StructField("_corrupt_record", StringType)))
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir).cache()
    assert(df.count() === 3)
    assert(df.filter(col("_corrupt_record").isNotNull).count() === 1)
    assert(df.filter(col("_corrupt_record").isNull).agg(sum(col("v"))).head().getDouble(0) === 40.0)
    df.unpersist()
  }

  test("SQL vec_weighted_sum equals the Column-form Aggregator") {
    GraftFunctions.register(spark)
    val rows = Seq((1L, 2.0, Seq(1.0, 0.0, 3.0)), (1L, 0.5, Seq(4.0, 2.0, 0.0)),
      (2L, 1.0, Seq(1.0, 1.0, 1.0)))
      .toDF("doc", "w", "vec")
    rows.createOrReplaceTempView("wvecs")
    val sql = spark.sql(
      "SELECT doc, vec_weighted_sum(w, vec) AS dv FROM wvecs GROUP BY doc ORDER BY doc")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    val col0 = rows.groupBy("doc")
      .agg(graft.agg.VecAgg.weightedSum(3)(col("w"), col("vec")).as("dv"))
      .orderBy("doc")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    assert(sql.toSeq === col0.toSeq)
    assert(sql.head._2 === Seq(4.0, 1.0, 6.0))
  }
}
