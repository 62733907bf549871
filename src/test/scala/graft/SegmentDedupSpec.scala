package graft

import java.nio.file.Files
import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ExtensionQueries

/** x74's reason to exist, on data the shared oracles can't distinguish:
  * segment-level dedup removes boilerplate shared across documents
  * WITHOUT dropping the documents that carry it — where every whole-doc
  * pass (x01/x02/x70) either keeps or kills the full text. Planted:
  * a 10-token boilerplate prefix (2 full W=5 windows) shared by docs
  * 1 and 2 with distinct tails, plus doc 3 an exact copy of doc 1.
  * Pins the keep rule (min-doc_id owner keeps, later carriers drop),
  * tail-window token accounting, and order-preserving reassembly
  * (cleaned_hash is recomputed here from first principles).
  */
class SegmentDedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("shared boilerplate drops from non-owner docs; owners and exact dups account exactly") {
    val boiler = (1 to 10).map(i => s"boiler$i").mkString(" ")
    val u1 = (1 to 5).map(i => s"apple$i").mkString(" ")
    val u2 = (1 to 5).map(i => s"banana$i").mkString(" ")
    val docs = Seq(
      (1L, s"$boiler $u1", "en", "srcA", 0L),
      (2L, s"$boiler $u2", "en", "srcA", 0L),
      (3L, s"$boiler $u1", "en", "srcA", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val work = Files.createTempDirectory("graft_segdedup")
    docs.write.parquet(s"$work/documents.parquet")

    val rows = ExtensionQueries.x74_segment_dedup(spark, work.toString)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap

    // doc 1 owns every one of its segments (min doc_id for the
    // boilerplate AND its own tail): nothing drops, reassembly is the
    // identity on its 15 tokens
    assert(rows(1L) === ((3L, 0L, 15L, md5hex(s"$boiler $u1"))))
    // doc 2 drops exactly the two boilerplate windows, keeps its own
    // 5-token tail window; the cleaned doc is just the tail
    assert(rows(2L) === ((3L, 2L, 5L, md5hex(u2))))
    // doc 3 is an exact copy of doc 1: every segment is owned by doc 1,
    // so everything drops and the cleaned doc is empty
    assert(rows(3L) === ((3L, 3L, 0L, md5hex(""))))
  }

  test("unaligned tail windows count their true token length") {
    // 7 tokens -> windows of 5 + 2; the second doc shares ONLY the
    // 2-token tail window, so its drop removes 2 tokens, not W=5
    val docs = Seq(
      (1L, "a1 a2 a3 a4 a5 t1 t2", "en", "s", 0L),
      (2L, "b1 b2 b3 b4 b5 t1 t2", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val work = Files.createTempDirectory("graft_segdedup_tail")
    docs.write.parquet(s"$work/documents.parquet")

    val rows = ExtensionQueries.x74_segment_dedup(spark, work.toString)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap

    assert(rows(1L) === ((2L, 0L, 7L, md5hex("a1 a2 a3 a4 a5 t1 t2"))))
    assert(rows(2L) === ((2L, 1L, 5L, md5hex("b1 b2 b3 b4 b5"))))
  }
}
