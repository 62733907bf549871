package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Upsert

class UpsertSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("mergeByKey: $set semantics — update wins (even a NULL value), " +
    "inserts and untouched rows kept") {
    val existing = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("id", "name", "score")
    // update 2 ($set name to NULL — reference stores doc_vectors=None
    // for empty docs, worker.py:87-94), insert 4
    val updates = Seq((2L, None: Option[String], 20.0),
      (4L, Some("d"), 4.0))
      .toDF("id", "name", "score")
    val merged = Upsert.mergeByKey(existing, updates, "id")
      .as[(Long, Option[String], Double)].collect().sortBy(_._1)
    assert(merged === Array(
      (1L, Some("a"), 1.0),
      (2L, None, 20.0), // the NULL is written back, not coalesced away
      (3L, Some("c"), 3.0),
      (4L, Some("d"), 4.0)))
  }

  test("mergeByKey: a NULL-key update row keeps its values (insert, not erased)") {
    val existing = Seq((1L, "a", 1.0)).toDF("id", "name", "score")
    val updates = Seq((Option.empty[Long], Some("orphan"), 7.0))
      .toDF("id", "name", "score")
    val merged = Upsert.mergeByKey(existing, updates, "id")
      .as[(Option[Long], Option[String], Double)].collect()
      .sortBy(_._1.getOrElse(Long.MaxValue))
    assert(merged === Array(
      (Some(1L), Some("a"), 1.0),
      // NULL key never joins — the row must surface with its OWN
      // values, not an all-NULL husk from the absent existing side
      (None, Some("orphan"), 7.0)))
  }

  test("mergeByKey handles disjoint column sets") {
    val existing = Seq((1L, "a")).toDF("id", "name")
    val updates = Seq((1L, 9.0)).toDF("id", "idf")
    val merged = Upsert.mergeByKey(existing, updates, "id")
    assert(merged.columns.toSet === Set("id", "name", "idf"))
    val r = merged.collect().head
    assert(r.getAs[String]("name") === "a")
    assert(r.getAs[Double]("idf") === 9.0)
  }

  test("mergeByKey survives an input column named like the marker") {
    val existing = Seq((1L, "a", false)).toDF("id", "name", "__graft_upd")
    val updates = Seq((1L, "b", true), (2L, "c", false))
      .toDF("id", "name", "__graft_upd")
    val merged = Upsert.mergeByKey(existing, updates, "id")
    // the user's column must survive, not be overwritten by the
    // internal row-presence marker
    assert(merged.columns.toSet === Set("id", "name", "__graft_upd"))
    val rows = merged.orderBy("id")
      .as[(Long, String, Boolean)].collect().toSeq
    assert(rows === Seq((1L, "b", true), (2L, "c", false)))
  }

  test("overwriteParquet is idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    Upsert.overwriteParquet(df, dir)
    Upsert.overwriteParquet(df, dir) // second write must not fail/dup
    assert(spark.read.parquet(dir).count() === 2)
  }
}
