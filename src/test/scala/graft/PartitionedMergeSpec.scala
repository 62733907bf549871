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
    assert(!Files.exists(Paths.get(dir + "__graft_stage")),
      "fault-tolerance staging must not outlive the merge")
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
