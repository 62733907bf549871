package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TableMaintenance

class TableMaintenanceSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("compact merges a many-small-files table, preserving every row") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/t"
    val df = spark.range(0, 10000).select(col("id"), (col("id") % 7).as("k"))
    df.repartition(64).write.parquet(dir) // simulate fine-grained ingest
    assert(TableMaintenance.dataFileCount(spark, dir) === 64)
    val before = spark.read.parquet(dir).agg(sum("id")).head().getLong(0)

    val n = TableMaintenance.compact(spark, dir, targetBytes = 1L << 30)
    assert(n === 1, s"expected 1 target file, got $n")
    val after = spark.read.parquet(dir)
    assert(after.count() === 10000)
    assert(after.agg(sum("id")).head().getLong(0) === before)
    // no leftover temp/backup dirs
    val parent = new java.io.File(dir).getParentFile.list().toSeq
    assert(parent === Seq("t"), s"leftovers: $parent")
  }

  test("writeClustered produces key-disjoint, internally sorted files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cluster").toString + "/t"
    val df = spark.range(0, 10000)
      .select((col("id") * 2654435761L % 10000).as("key"), col("id").as("v"))
    TableMaintenance.writeClustered(df, dir, "key", nFiles = 8)
    assert(TableMaintenance.dataFileCount(spark, dir) === 8)

    val ranges = TableMaintenance.fileKeyRanges(spark, dir, "key")
      .sortBy(_._2)
    assert(ranges.size === 8)
    // ranges must not overlap: each file's min exceeds the previous max
    ranges.sliding(2).foreach {
      case Seq((fa, _, amax), (fb, bmin, _)) =>
        assert(bmin >= amax, s"files $fa and $fb overlap: $amax vs $bmin")
      case _ =>
    }
    // nothing lost in the layout rewrite
    assert(spark.read.parquet(dir).count() === 10000)

    // and the layout actually prunes: a selective key-range scan reads
    // fewer split bytes than the full table (parquet min/max skipping
    // happens at row-group level inside the scan; assert the planner
    // kept the predicate pushable)
    val scan = spark.read.parquet(dir).filter(col("key") < 100)
    val pushed = scan.queryExecution.executedPlan.toString
    assert(pushed.contains("PushedFilters: [IsNotNull(key), LessThan(key,100)]"),
      s"key predicate not pushed:\n$pushed")
    assert(scan.count() === df.filter(col("key") < 100).count())
  }
}
