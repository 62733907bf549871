package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit fixtures for the reference's quirk semantics (SURVEY.md §2/§7.4):
  * `$ne: true` trivalent logic (P3), occurrence-count IDF + floor (A2/F6),
  * guarded divisions (F7).
  */
class SemanticsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("P3: flag IS DISTINCT FROM true keeps NULL and false, drops true") {
    val df = Seq((1L, Some(true)), (2L, Some(false)), (3L, None))
      .toDF("id", "flag")
    val kept = df.filter(!coalesce(col("flag"), lit(false)))
      .select("id").as[Long].collect().sorted
    assert(kept === Array(2L, 3L))
    // the naive translation drops the NULL row — guard against it
    val naive = df.filter(col("flag") =!= true).select("id").as[Long].collect()
    assert(naive === Array(2L)) // documents why <> is wrong
  }

  test("A2/F5/F6: idf = log10(N/occ), occurrence-count not doc-freq, " +
    "sentinel -1 for occ=0, floor all idf<=0 to global min") {
    // fixture: N=2 posts; word 'x' occurs 3 times in one post (counts 3),
    // word 'y' once, word 'z' never (vocab member without occurrences).
    // raw: x=log10(2/3)<0, y=log10(2)>0, z=-1
    // min_raw=-1 -> x floored to -1, z=-1, y keeps log10(2).
    val posts = Seq((1L, "x x x y"), (2L, "w w w w")).toDF("doc_id", "text")
    val vocab = Seq("x", "y", "z").toDF("token")
    val tok = posts.select(col("doc_id"),
      explode(graft.functions.Tokenize.tokens(col("text"))).as("token"))
    val n = posts.count().toDouble
    val occ = tok.groupBy("token").agg(count(lit(1)).as("c"))
    val raw = vocab.join(occ, Seq("token"), "left")
      .withColumn("occ", coalesce(col("c"), lit(0L)))
      .withColumn("raw",
        when(col("occ") > 0, log10(lit(n) / col("occ"))).otherwise(lit(-1.0)))
    val minRaw = raw.agg(min("raw")).as[Double].head()
    assert(minRaw === -1.0)
    val idf = raw.withColumn("idf",
      when(col("raw") > 0, col("raw")).otherwise(lit(minRaw)))
      .select("token", "idf").as[(String, Double)].collect().toMap
    assert(idf("z") === -1.0)
    assert(idf("x") === -1.0) // negative raw floored — the F6 quirk
    assert(math.abs(idf("y") - math.log10(2.0)) < 1e-12)
  }

  test("F7: zero-guarded division yields 0, not NULL") {
    val df = Seq((1.0, 0.0), (4.0, 2.0)).toDF("num", "den")
    val got = df.select(
      when(col("den") > 0, col("num") / col("den")).otherwise(lit(0.0)).as("q"))
      .as[Double].collect().sorted
    assert(got === Array(0.0, 2.0))
  }

  test("A6: known_tokens_ratio = distinct known / total tokens") {
    // doc 'x x y z': total=4 tokens, known(distinct in vocab {x,y})=2 -> 0.5
    val tf = Seq(("x", 2L), ("y", 1L), ("z", 1L)).toDF("token", "cnt")
    val vocab = Seq("x", "y").toDF("token")
    val total = tf.agg(sum("cnt")).as[Long].head()
    val known = tf.join(vocab, Seq("token"), "left_semi").count()
    assert(known.toDouble / total === 0.5)
  }

  test("x53 funnel: a same-timestamp next-stage event does NOT advance the funnel") {
    // The classic funnel off-by-one: stage N+1 must be STRICTLY after
    // stage N. Ties are pinned here because the generated testdata may
    // or may not contain one.
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val ev = Seq(
      // u1: click exactly at t_view is ignored; the later click counts
      ("u1", "view", ts(100)), ("u1", "click", ts(100)), ("u1", "click", ts(101)),
      // u2: ONLY a tied click -> funnel stops at stage 1
      ("u2", "view", ts(100)), ("u2", "click", ts(100)),
      // u3: click BEFORE the first view is ignored too (out-of-order)
      ("u3", "click", ts(50)), ("u3", "view", ts(100)), ("u3", "click", ts(150)),
      // u4: purchase tied with click -> stage 2, not 3
      ("u4", "view", ts(10)), ("u4", "click", ts(20)), ("u4", "purchase", ts(20)),
      // u5: clean 3-stage conversion
      ("u5", "view", ts(1)), ("u5", "click", ts(2)), ("u5", "purchase", ts(3)))
      .toDF("user_id", "event_type", "ts")
    val got = graft.queries.AnalyticsQueries.funnelFrom(ev)
      .select("user_id", "t_view", "t_click", "t_purchase", "funnel_stage")
      .as[(String, Option[Long], Option[Long], Option[Long], Int)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("u1") === ("u1", Some(100L), Some(101L), None, 2))
    assert(got("u2") === ("u2", Some(100L), None, None, 1))
    assert(got("u3") === ("u3", Some(100L), Some(150L), None, 2))
    assert(got("u4") === ("u4", Some(10L), Some(20L), None, 2))
    assert(got("u5") === ("u5", Some(1L), Some(2L), Some(3L), 3))
  }
}
