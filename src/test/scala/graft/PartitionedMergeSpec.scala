package graft

import java.nio.file.{Files, Path => JPath, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Upsert

/** Round-4 verdict #4: the MERGE a continuously-upserting partitioned
  * store needs — only the partitions the batch touches may rewrite.
  * "Untouched" is asserted at the byte level: same file names, same
  * file bytes, after the merge.
  */
class PartitionedMergeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** relative path -> MD5 for every data file under dir. */
  private def fileHashes(dir: String): Map[String, String] = {
    val root = Paths.get(dir)
    Files.walk(root).iterator().asScala
      .filter(p => Files.isRegularFile(p) && !p.getFileName.toString.startsWith("_")
        && !p.getFileName.toString.startsWith("."))
      .map { p: JPath =>
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(Files.readAllBytes(p)).map("%02x".format(_)).mkString
        (root.relativize(p).toString, md5)
      }.toMap
  }

  private def seed(dir: String): Unit =
    Seq((1L, "d1", "a"), (2L, "d2", "b"), (3L, "d2", "c"), (4L, "d3", "d"))
      .toDF("id", "day", "v")
      .write.partitionBy("day").parquet(dir)

  test("merge rewrites only touched partitions; untouched files are byte-identical") {
    val dir = Files.createTempDirectory("graft_pmerge").toString + "/t"
    seed(dir)
    val before = fileHashes(dir)

    // batch touches ONLY d2: update id=2, insert id=20
    Upsert.mergeByKeyPartitioned(dir,
      Seq((2L, "d2", "B!"), (20L, "d2", "new")).toDF("id", "day", "v"),
      key = "id", partCol = "day")

    val after = fileHashes(dir)
    val untouched = (p: String) => p.contains("day=d1") || p.contains("day=d3")
    assert(before.view.filterKeys(untouched).toMap
      === after.view.filterKeys(untouched).toMap,
      "untouched partitions must keep the exact same file set and bytes")
    assert(after.keys.exists(_.contains("day=d2")))

    // merged content: id=2 replaced, id=3 survived inside d2, id=20 inserted
    val got = spark.read.parquet(dir).orderBy("id")
      .select("id", "v", "day").as[(Long, String, String)].collect().toSeq
    assert(got === Seq((1L, "a", "d1"), (2L, "B!", "d2"), (3L, "c", "d2"),
      (4L, "d", "d3"), (20L, "new", "d2")))
  }

  test("Materialize.Stage gives the same merge and cleans up its staging dir") {
    val dir = Files.createTempDirectory("graft_pmerge_stage").toString + "/t"
    seed(dir)
    val before = fileHashes(dir)

    Upsert.mergeByKeyPartitioned(dir,
      Seq((2L, "d2", "B!"), (20L, "d2", "new")).toDF("id", "day", "v"),
      key = "id", partCol = "day", materialize = graft.sources.Materialize.Stage)

    val untouched = (p: String) => p.contains("day=d1") || p.contains("day=d3")
    val after = fileHashes(dir)
    assert(before.view.filterKeys(untouched).toMap
      === after.view.filterKeys(untouched).toMap)
    val got = spark.read.parquet(dir).orderBy("id")
      .select("id", "v", "day").as[(Long, String, String)].collect().toSeq
    assert(got === Seq((1L, "a", "d1"), (2L, "B!", "d2"), (3L, "c", "d2"),
      (4L, "d", "d3"), (20L, "new", "d2")))
    assert(!stageDirsNextTo(dir),
      "fault-tolerance staging must not outlive the merge")
  }

  /** Any `<table>__graft_stage*` sibling left behind? */
  private def stageDirsNextTo(dir: String): Boolean = {
    val p = Paths.get(dir)
    Files.list(p.getParent).iterator().asScala
      .exists(_.getFileName.toString.startsWith(p.getFileName.toString + "__graft_stage"))
  }

  /** An updates frame whose evaluation throws on the executor — drives
    * the failure path of the staging write itself.
    */
  private def poisoned = {
    val boom = org.apache.spark.sql.functions.udf((s: String) =>
      if (s != null) throw new RuntimeException("poisoned batch") else s)
    Seq((2L, "d2", "B!")).toDF("id", "day", "v").withColumn("v", boom($"v"))
  }

  test("Stage cleans up its staging dir even when the merge fails (r7 verdict #2)") {
    val dir = Files.createTempDirectory("graft_pmerge_fail").toString + "/t"
    seed(dir)
    val before = fileHashes(dir)
    intercept[Exception] {
      Upsert.mergeByKeyPartitioned(dir, poisoned, "id", "day",
        materialize = graft.sources.Materialize.Stage)
    }
    assert(fileHashes(dir) === before, "a failed merge must leave the table untouched")
    assert(!stageDirsNextTo(dir), "failed merge leaked its staging directory")
  }

  test("two sequential Stage merges to one table compose and leave no staging dirs") {
    val dir = Files.createTempDirectory("graft_pmerge_seq").toString + "/t"
    seed(dir)
    Upsert.mergeByKeyPartitioned(dir,
      Seq((2L, "d2", "B!")).toDF("id", "day", "v"),
      "id", "day", materialize = graft.sources.Materialize.Stage)
    Upsert.mergeByKeyPartitioned(dir,
      Seq((4L, "d3", "D!"), (40L, "d3", "new")).toDF("id", "day", "v"),
      "id", "day", materialize = graft.sources.Materialize.Stage)
    val got = spark.read.parquet(dir).orderBy("id")
      .select("id", "v", "day").as[(Long, String, String)].collect().toSeq
    assert(got === Seq((1L, "a", "d1"), (2L, "B!", "d2"), (3L, "c", "d2"),
      (4L, "D!", "d3"), (40L, "new", "d3")))
    assert(!stageDirsNextTo(dir))
  }

  test("Reliable stages into its dir, cleans up, and never touches session checkpoint state (r7 verdict #3)") {
    val dir = Files.createTempDirectory("graft_pmerge_rel").toString + "/t"
    val scratch = Files.createTempDirectory("graft_reliable_scratch")
    seed(dir)
    val ckptBefore = spark.sparkContext.getCheckpointDir
    Upsert.mergeByKeyPartitioned(dir,
      Seq((2L, "d2", "B!"), (20L, "d2", "new")).toDF("id", "day", "v"),
      "id", "day", materialize = graft.sources.Materialize.Reliable(scratch.toString))
    assert(spark.sparkContext.getCheckpointDir === ckptBefore,
      "Reliable must not clobber the session checkpoint dir")
    assert(!Files.list(scratch).iterator().asScala.hasNext,
      "Reliable leaked staging data under its scratch root")
    val got = spark.read.parquet(dir).orderBy("id")
      .select("id", "v", "day").as[(Long, String, String)].collect().toSeq
    assert(got === Seq((1L, "a", "d1"), (2L, "B!", "d2"), (3L, "c", "d2"),
      (4L, "d", "d3"), (20L, "new", "d2")))
    // and the failure path cleans up too
    intercept[Exception] {
      Upsert.mergeByKeyPartitioned(dir, poisoned, "id", "day",
        materialize = graft.sources.Materialize.Reliable(scratch.toString))
    }
    assert(!Files.list(scratch).iterator().asScala.hasNext,
      "failed Reliable merge leaked staging data")
  }

  test("a batch with a brand-new partition adds it without touching the rest") {
    val dir = Files.createTempDirectory("graft_pmerge2").toString + "/t"
    seed(dir)
    val before = fileHashes(dir)
    Upsert.mergeByKeyPartitioned(dir,
      Seq((9L, "d9", "z")).toDF("id", "day", "v"), "id", "day")
    val after = fileHashes(dir)
    assert(before === after.view.filterKeys(!_.contains("day=d9")).toMap)
    assert(spark.read.parquet(dir).filter($"day" === "d9").count() === 1)
  }

  test("first merge into a nonexistent table creates it") {
    val dir = Files.createTempDirectory("graft_pmerge3").toString + "/t"
    Upsert.mergeByKeyPartitioned(dir,
      Seq((1L, "d1", "a")).toDF("id", "day", "v"), "id", "day")
    assert(spark.read.parquet(dir).count() === 1)
  }

  test("rows with a NULL partition value are rejected loudly") {
    val dir = Files.createTempDirectory("graft_pmerge4").toString + "/t"
    seed(dir)
    val bad = Seq((5L, Option.empty[String], "x")).toDF("id", "day", "v")
    val e = intercept[IllegalArgumentException] {
      Upsert.mergeByKeyPartitioned(dir, bad, "id", "day")
    }
    assert(e.getMessage.contains("NULL day"))
  }
}
