package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.VersionedStore

class VersionedStoreSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("publish/readVersion/readLatest: snapshots are immutable and pinnable") {
    val root = java.nio.file.Files.createTempDirectory("graft_vstore").toString
    assert(VersionedStore.latestVersion(root).isEmpty)

    val v0 = VersionedStore.publish(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), root)
    val v1 = VersionedStore.publish(
      Seq((1L, "a"), (2L, "B"), (3L, "c")).toDF("id", "v"), root)
    assert(v0 === 0L && v1 === 1L)
    assert(VersionedStore.latestVersion(root) === Some(1L))

    // pinned read sees the OLD snapshot unchanged after later publishes
    val pinned = VersionedStore.readVersion(spark, root, 0L)
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(pinned === Seq((1L, "a"), (2L, "b")))
    val latest = VersionedStore.readLatest(spark, root)
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(latest === Seq((1L, "a"), (2L, "B"), (3L, "c")))
  }

  test("a merge publishes as a new version, never rewriting the old one") {
    val root = java.nio.file.Files.createTempDirectory("graft_vstore2").toString
    val base = Seq((1L, 10.0), (2L, 20.0)).toDF("id", "score")
    VersionedStore.publish(base, root)
    val updates = Seq((2L, 99.0), (3L, 30.0)).toDF("id", "score")
    val merged = graft.sources.Upsert.mergeByKey(
      VersionedStore.readLatest(spark, root), updates, "id")
    val v = VersionedStore.publish(merged, root)
    assert(v === 1L)
    assert(VersionedStore.readVersion(spark, root, 0L).count() === 2)
    val got = VersionedStore.readLatest(spark, root)
      .orderBy("id").as[(Long, Double)].collect().toSeq
    assert(got === Seq((1L, 10.0), (2L, 99.0), (3L, 30.0)))
  }
}
