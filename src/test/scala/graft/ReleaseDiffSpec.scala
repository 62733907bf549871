package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{SketchStore, VersionedStore}

/** Contract for Pipeline.releaseDiff: the doc-level delta is exact
  * (one full-outer join on content hashes), and the vocab-drift
  * section reads ONLY the releases' shipped theta sketches — at
  * sub-sketch cardinalities those estimates are exact too, so every
  * number here is value-checked against the planted truth.
  */
class ReleaseDiffSpec extends AnyFunSuite with SparkSpec {

  private def release(store: String,
      rows: Seq[(Long, String, String)]): Long = {
    import spark.implicits._
    val docs = rows.toDF("doc_id", "lang", "text")
    VersionedStore.publishAll(
      Map("documents" -> docs, "stats" -> SketchStore.vocabStats(docs)),
      store)
  }

  private val base = Seq(
    (1L, "en", "alpha beta gamma"),
    (2L, "en", "beta gamma delta"),
    (3L, "en", "alpha delta"),
    (10L, "en", "gamma gamma alpha"),
    (20L, "fr", "bonjour le monde"))

  test("planted add/remove/change and a vanished language are reported exactly") {
    val store = java.nio.file.Files
      .createTempDirectory("graft_reldiff").toString + "/store"
    val v1 = release(store, base)
    // v2: drop 10 and the only fr doc, add 11 (new tokens), rewrite 3
    val v2 = release(store, Seq(
      (1L, "en", "alpha beta gamma"),
      (2L, "en", "beta gamma delta"),
      (3L, "en", "zephyr quasar"),
      (11L, "en", "epsilon zeta")))
    val d = Pipeline.releaseDiff(spark, store, v1, v2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getDouble(3))).toSeq
    def docs(m: String) =
      d.collectFirst { case ("docs", _, `m`, v) => v }.get
    assert(docs("added") == 1.0, "doc 11")
    assert(docs("removed") == 2.0, "docs 10 and 20")
    assert(docs("changed") == 1.0, "doc 3")
    assert(docs("unchanged") == 2.0, "docs 1 and 2")
    def vocab(lang: String, m: String) =
      d.collectFirst { case ("vocab", `lang`, `m`, v) => v }.get
    // en: old {alpha beta gamma delta} new {alpha beta gamma delta
    // zephyr quasar epsilon zeta}; theta is exact at this cardinality
    assert(math.abs(vocab("en", "vocab_old") - 4.0) < 1e-6)
    assert(math.abs(vocab("en", "vocab_new") - 8.0) < 1e-6)
    assert(math.abs(vocab("en", "appeared") - 4.0) < 1e-6)
    assert(math.abs(vocab("en", "dropped") - 0.0) < 1e-6)
    assert(math.abs(vocab("en", "common") - 4.0) < 1e-6)
    // fr vanished entirely: the full-outer keeps the language with an
    // empty new-side sketch
    assert(math.abs(vocab("fr", "vocab_old") - 3.0) < 1e-6)
    assert(math.abs(vocab("fr", "vocab_new") - 0.0) < 1e-6)
    assert(math.abs(vocab("fr", "dropped") - 3.0) < 1e-6)
    assert(math.abs(vocab("fr", "appeared") - 0.0) < 1e-6)
  }

  test("self-diff is identity: zero deltas, vocab common == both sides") {
    val store = java.nio.file.Files
      .createTempDirectory("graft_reldiff_self").toString + "/store"
    val v1 = release(store, base)
    val d = Pipeline.releaseDiff(spark, store, v1, v1).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getDouble(3))).toSeq
    def docs(m: String) =
      d.collectFirst { case ("docs", _, `m`, v) => v }.get
    assert(docs("added") == 0.0 && docs("removed") == 0.0 &&
      docs("changed") == 0.0 && docs("unchanged") == base.length.toDouble)
    d.collect { case ("vocab", l, "appeared", v) => (l, v) }
      .foreach { case (l, v) => assert(v == 0.0, s"appeared $l") }
    d.collect { case ("vocab", l, "dropped", v) => (l, v) }
      .foreach { case (l, v) => assert(v == 0.0, s"dropped $l") }
  }
}
