package graft

import java.nio.file.Files
import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ExtensionQueries

/** x77's defining property on planted data: a cross-document repeat of
  * length >= W tokens is recovered IN FULL — one island per document,
  * at that document's own offset, with the exact extent and the span
  * text pinned by hash — while repeats shorter than W are invisible by
  * design. The generator corpus can't pin this (its dups are mostly
  * whole-doc copies); here the shared run sits at DIFFERENT offsets in
  * each carrier, which is exactly the unaligned case x74's fixed
  * segmentation cannot see.
  */
class DupSpanSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val W = 8 // must match ExtensionQueries.SpanW

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def mkDocs(rows: Seq[(Long, String)]): String = {
    val work = Files.createTempDirectory("graft_dupspan")
    rows.map { case (id, t) => (id, t, "en", "s", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$work/documents.parquet")
    work.toString
  }

  test("a 12-token repeat at different offsets yields one exact island per doc") {
    val shared = (1 to 12).map(i => s"s$i").mkString(" ")
    val d1 = ((1 to 10).map(i => s"a$i") :+ shared) ++ (1 to 8).map(i => s"b$i")
    val d2 = ((1 to 5).map(i => s"c$i") :+ shared) ++ (1 to 9).map(i => s"d$i")
    val dir = mkDocs(Seq(1L -> d1.mkString(" "), 2L -> d2.mkString(" ")))

    val got = ExtensionQueries.x77_dup_spans(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))

    val nGrams = (12 - W + 1).toLong // 5 duplicated windows inside the repeat
    assert(got.toSeq === Seq(
      (1L, 10L, 12L, nGrams, md5hex(shared)),
      (2L, 5L, 12L, nGrams, md5hex(shared))))
  }

  test("repeats shorter than W are invisible; whole-doc copies span the whole doc") {
    val short = (1 to (W - 1)).map(i => s"t$i").mkString(" ") // W-1 tokens: below resolution
    val copy = (1 to 20).map(i => s"w$i").mkString(" ")
    val dir = mkDocs(Seq(
      1L -> s"${(1 to 6).map(i => s"e$i").mkString(" ")} $short",
      2L -> s"$short ${(1 to 6).map(i => s"f$i").mkString(" ")}",
      3L -> copy,
      4L -> copy))

    val got = ExtensionQueries.x77_dup_spans(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))

    // docs 1/2 share only W-1 tokens -> nothing; docs 3/4 are exact
    // copies -> one island covering all 20 tokens each
    val nGrams = (20 - W + 1).toLong
    assert(got.toSeq === Seq(
      (3L, 0L, 20L, nGrams, md5hex(copy)),
      (4L, 0L, 20L, nGrams, md5hex(copy))))
  }

  test("randomized corpora: x77 equals a brute-force reference") {
    // small alphabet forces organic cross-doc window collisions; the
    // reference marks every position whose W-window occurs in another
    // doc and merges consecutive marks — computed with plain hash
    // maps, no shared code with the query
    val alphabet = Vector("a", "b") // 2^W gram space => organic collisions
    for (seed <- Seq(7, 21, 99)) {
      val rnd = new scala.util.Random(seed)
      val docs = (1L to 12L).map { id =>
        val n = 10 + rnd.nextInt(20)
        id -> Vector.fill(n)(alphabet(rnd.nextInt(alphabet.size)))
      }
      val dir = mkDocs(docs.map { case (id, toks) => id -> toks.mkString(" ") })

      // brute force: gram -> set of docs containing it
      val gramDocs = scala.collection.mutable.Map[Seq[String], Set[Long]]()
      for ((id, toks) <- docs; i <- 0 to toks.size - W)
        gramDocs.updateWith(toks.slice(i, i + W)) {
          prev => Some(prev.getOrElse(Set.empty) + id)
        }
      val expected = docs.flatMap { case (id, toks) =>
        val dup = (0 to toks.size - W)
          .filter(i => gramDocs(toks.slice(i, i + W)).size >= 2)
        // islands of consecutive duplicated starts
        val islands = dup.foldLeft(List.empty[List[Int]]) {
          case (acc, p) if acc.nonEmpty && acc.head.head == p - 1 =>
            (p :: acc.head) :: acc.tail
          case (acc, p) => List(p) :: acc
        }.map(_.reverse).reverse
        islands.map { isl =>
          val start = isl.head
          val len = isl.last - start + W
          (id, start.toLong, len.toLong, isl.size.toLong,
            md5hex(toks.slice(start, start + len).mkString(" ")))
        }
      }

      val got = ExtensionQueries.x77_dup_spans(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4)))
      assert(got.toSeq === expected,
        s"seed $seed: x77 diverges from the brute-force reference")
      assert(expected.nonEmpty,
        s"seed $seed: alphabet should produce organic collisions")
    }
  }

  test("randomized corpora: x86 removal equals a brute-force reference") {
    // independent reference for the surgery: every span whose exact
    // content also lives in a smaller doc_id has its positions cut;
    // the canonical (min doc_id per span content) keeps everything.
    // Position-set union handles overlapping cut intervals for free —
    // the same invariant the query must honor.
    val alphabet = Vector("a", "b")
    var sawRemoval = false
    for (seed <- Seq(5, 33, 77)) {
      val rnd = new scala.util.Random(seed)
      val docs = (1L to 12L).map { id =>
        val n = 10 + rnd.nextInt(20)
        id -> Vector.fill(n)(alphabet(rnd.nextInt(alphabet.size)))
      }
      val dir = mkDocs(docs.map { case (id, toks) => id -> toks.mkString(" ") })

      val gramDocs = scala.collection.mutable.Map[Seq[String], Set[Long]]()
      for ((id, toks) <- docs; i <- 0 to toks.size - W)
        gramDocs.updateWith(toks.slice(i, i + W)) {
          prev => Some(prev.getOrElse(Set.empty) + id)
        }
      val spans = docs.flatMap { case (id, toks) =>
        val dup = (0 to toks.size - W)
          .filter(i => gramDocs(toks.slice(i, i + W)).size >= 2)
        val islands = dup.foldLeft(List.empty[List[Int]]) {
          case (acc, p) if acc.nonEmpty && acc.head.head == p - 1 =>
            (p :: acc.head) :: acc.tail
          case (acc, p) => List(p) :: acc
        }.map(_.reverse).reverse
        islands.map { isl =>
          val start = isl.head
          val len = isl.last - start + W
          (id, start, len, toks.slice(start, start + len).mkString(" "))
        }
      }
      val keeper = spans.groupBy(_._4).map { case (c, ss) => c -> ss.map(_._1).min }
      val expected = docs.filter(_._2.size >= W).map { case (id, toks) =>
        val cut = spans.filter(s => s._1 == id && keeper(s._4) != id)
          .flatMap(s => s._2 until (s._2 + s._3)).toSet
        val kept = toks.zipWithIndex.collect { case (t, i) if !cut(i) => t }
        (id, toks.size.toLong, cut.size.toLong, md5hex(kept.mkString(" ")))
      }

      val got = ExtensionQueries.x86_span_removal(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      assert(got.toSeq === expected,
        s"seed $seed: x86 diverges from the brute-force reference")
      sawRemoval ||= expected.exists(_._3 > 0)
    }
    assert(sawRemoval, "at least one seed should force a removal")
  }

  test("planted copy: the min-doc_id canonical keeps, every other copy is cut") {
    val copy = (1 to 12).map(i => s"c$i").mkString(" ")
    val pad2 = (1 to 4).map(i => s"u$i").mkString(" ")
    val pad3 = (1 to 6).map(i => s"v$i").mkString(" ")
    val dir = mkDocs(Seq(
      3L -> s"$pad3 $copy", // larger id, front padding
      1L -> copy, // canonical: smallest doc_id holding the span
      2L -> s"$copy $pad2"))
    val got = ExtensionQueries.x86_span_removal(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    assert(got(0) === ((1L, 12L, 0L, md5hex(copy))))
    assert(got(1) === ((2L, 16L, 12L, md5hex(pad2))))
    assert(got(2) === ((3L, 18L, 12L, md5hex(pad3))))
  }

  test("two disjoint repeats in one doc stay two islands") {
    val r1 = (1 to W).map(i => s"p$i").mkString(" ")
    val r2 = (1 to W).map(i => s"q$i").mkString(" ")
    val gap = (1 to 3).map(i => s"g$i").mkString(" ") // < W so islands can't bridge
    val dir = mkDocs(Seq(
      1L -> s"$r1 $gap $r2",
      2L -> s"$r1 ${(1 to 5).map(i => s"h$i").mkString(" ")}",
      3L -> s"${(1 to 4).map(i => s"k$i").mkString(" ")} $r2"))

    val doc1 = ExtensionQueries.x77_dup_spans(spark, dir).collect()
      .filter(_.getLong(0) == 1L)
      .map(r => (r.getLong(1), r.getLong(2), r.getString(4)))
    assert(doc1.toSeq === Seq(
      (0L, W.toLong, md5hex(r1)),
      ((W + 3).toLong, W.toLong, md5hex(r2))))
  }
}
