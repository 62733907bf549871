package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ExtensionQueries

/** Value-level contracts for the data-mix planning operators:
  * x104 (UniMax waterfilling budget allocation) and x105 (DSIR
  * hashed-bigram importance weights). Each is replayed against an
  * independent driver-side implementation of the published algorithm
  * — the sequential greedy waterfill for UniMax, the raw
  * log-likelihood-ratio scorer for DSIR — so the distributed
  * closed-form plans are pinned to the papers' semantics, not to
  * themselves.
  */
class DataMixSpec extends AnyFunSuite with SparkSpec {

  private def tok(text: String): Seq[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def round(v: Double, d: Int): Double = {
    val p = math.pow(10, d)
    math.floor(v * p + 0.5) / p
  }

  // --- x104 UniMax ------------------------------------------------------

  /** The published algorithm verbatim: ascending-size sequential greedy.
    * Each step computes the current water level (remaining budget over
    * remaining languages); a language under C epochs of it caps, and
    * its unused share stays in the pool for the rest.
    */
  private def greedyUniMax(sizes: Seq[(String, Long)], cap: Double)
      : Map[String, Double] = {
    var remaining = sizes.map(_._2.toDouble).sum
    var left = sizes.size
    val out = scala.collection.mutable.Map[String, Double]()
    sizes.sortBy { case (l, n) => (n, l) }.foreach { case (lang, n) =>
      val level = remaining / left
      val alloc = math.min(cap * n, level)
      out(lang) = alloc
      remaining -= alloc
      left -= 1
    }
    out.toMap
  }

  private lazy val unimax =
    ExtensionQueries.x104_unimax(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))

  test("x104: allocation conserves the budget exactly") {
    val totalTokens = unimax.map(_._2).sum.toDouble
    val totalAlloc = unimax.map(_._4).sum
    // each alloc is rounded to 4 decimals (±5e-5), so the summed
    // error bound is nLangs × 5e-5
    val bound = unimax.length * 5e-5
    assert(math.abs(totalAlloc - totalTokens) <= bound,
      s"alloc $totalAlloc != budget $totalTokens (bound $bound)")
  }

  test("x104: capped languages sit at exactly the epoch cap, uncapped below") {
    assert(unimax.exists(_._3 == 1L) && unimax.exists(_._3 == 0L),
      "fixture must exercise both branches")
    unimax.foreach { case (lang, n, capped, alloc, epochs) =>
      if (capped == 1L) {
        assert(epochs == ExtensionQueries.UniMaxCap, s"$lang epochs $epochs")
        assert(math.abs(alloc - ExtensionQueries.UniMaxCap * n) < 1e-3)
      } else {
        assert(epochs < ExtensionQueries.UniMaxCap,
          s"uncapped $lang at $epochs >= cap")
      }
    }
  }

  test("x104: closed form == sequential greedy waterfill") {
    val ref = greedyUniMax(
      unimax.map(t => (t._1, t._2)).toSeq, ExtensionQueries.UniMaxCap)
    unimax.foreach { case (lang, _, _, alloc, _) =>
      assert(math.abs(alloc - round(ref(lang), 4)) < 1e-6,
        s"$lang: closed $alloc vs greedy ${ref(lang)}")
    }
  }

  test("x104: uncapped languages all receive the same share") {
    val shares = unimax.collect { case (_, _, 0L, alloc, _) => alloc }
    assert(shares.nonEmpty)
    assert(shares.forall(s => math.abs(s - shares.head) < 1e-6))
  }

  test("x104 allocator: a single language is never capped and takes the whole budget") {
    import spark.implicits._
    val out = ExtensionQueries.unimaxAlloc(
      Seq(("solo", 100L)).toDF("lang", "n_tokens")).collect()
    assert(out.length == 1)
    val r = out.head
    // C > 1 makes capping a single language impossible: C·n > B = n
    assert(r.getLong(2) == 0L, "single language must be uncapped")
    assert(math.abs(r.getDouble(3) - 100.0) < 1e-9, "alloc = whole budget")
    assert(math.abs(r.getDouble(4) - 1.0) < 1e-9, "exactly one epoch")
  }

  test("x104 allocator: extreme skew caps every small language, greedy agrees") {
    import spark.implicits._
    val sizes = Seq(("tiny1", 10L), ("tiny2", 10L), ("huge", 1000L))
    val out = ExtensionQueries.unimaxAlloc(sizes.toDF("lang", "n_tokens"))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getDouble(3))).toSeq
    val ref = greedyUniMax(sizes, ExtensionQueries.UniMaxCap)
    out.foreach { case (lang, capped, alloc) =>
      assert(math.abs(alloc - round(ref(lang), 4)) < 1e-6, s"$lang")
      if (lang != "huge") assert(capped == 1L, s"$lang should cap")
      else assert(capped == 0L, "the large language absorbs the rest")
    }
    // reclaimed budget lands on the big language: 1020 − 2·12 = 996
    assert(math.abs(out.collect { case ("huge", _, a) => a }.head - 996.0) < 1e-6)
  }

  // --- x105 DSIR --------------------------------------------------------

  /** Independent driver-side DSIR replay over the raw table: hashed
    * bigram bags, add-1 smoothed target/raw bucket distributions,
    * per-doc count-weighted LLR, top-k by (rounded weight desc,
    * doc_id).
    */
  private lazy val tempered =
    ExtensionQueries.x122_temp_mixture(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))

  test("x122: tempered probabilities normalize and conserve the budget") {
    assert(math.abs(tempered.map(_._4).sum - 1.0) <= tempered.length * 5e-7,
      s"q does not sum to 1: ${tempered.map(_._4).sum}")
    val totalTokens = tempered.map(_._2).sum.toDouble
    val totalAlloc = tempered.map(_._5).sum
    assert(math.abs(totalAlloc - totalTokens) <= tempered.length * 5e-5,
      s"alloc $totalAlloc != budget $totalTokens")
  }

  test("x122: α < 1 compresses shares — tails upsampled, heads downsampled, order kept") {
    val byN = tempered.sortBy(_._2)
    // q stays monotone in n (tempering reorders nothing) …
    assert(byN.map(_._4).toSeq == byN.map(_._4).toSeq.sorted,
      "q must stay monotone in corpus share")
    // … but every ratio is compressed: for the extremes,
    // q_max/q_min < p_max/p_min, and epochs cross 1.0
    val (lo, hi) = (byN.head, byN.last)
    if (lo._2 != hi._2) {
      assert(hi._4 / lo._4 < hi._3 / lo._3,
        "tempering must compress the share ratio")
      assert(lo._6 > 1.0, s"smallest language should be upsampled: ${lo._6}")
      assert(hi._6 < 1.0, s"largest language should be downsampled: ${hi._6}")
    }
  }

  test("x122: q replays exactly from the closed form") {
    val n = tempered.map(t => t._1 -> t._2).toMap
    val budget = n.values.sum.toDouble
    val pa = n.view.mapValues(v => math.pow(v / budget, 0.3)).toMap
    val z = pa.values.sum
    tempered.foreach { case (lang, _, p, q, alloc, epochs) =>
      assert(p == round(n(lang) / budget, 6))
      assert(q == round(pa(lang) / z, 6))
      assert(alloc == round(pa(lang) / z * budget, 4))
      assert(epochs == round(pa(lang) / z * budget / n(lang), 6))
    }
  }

  private def dsirReference(): Seq[(Long, Long, Double)] = {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val B = 64
    def buckets(text: String): Seq[Int] =
      tok(text).sliding(2).filter(_.size == 2).map(_.mkString(" "))
        .map(g => (java.lang.Long.parseLong(md5hex(g).take(7), 16) % B).toInt)
        .toSeq
    val perDoc = docs.map { case (id, lang, text) => (id, lang, buckets(text)) }
    val tgt = new Array[Long](B)
    val raw = new Array[Long](B)
    perDoc.foreach { case (_, lang, bs) =>
      bs.foreach { b =>
        raw(b) += 1
        if (lang == "en") tgt(b) += 1
      }
    }
    val tt = tgt.sum.toDouble
    val rr = raw.sum.toDouble
    perDoc.filter(_._3.nonEmpty).map { case (id, _, bs) =>
      val w = bs.groupBy(identity).map { case (b, g) =>
        g.size * (math.log(tgt(b) + 1.0) - math.log(tt + B) -
          math.log(raw(b) + 1.0) + math.log(rr + B))
      }.sum
      (id, bs.size.toLong, round(w, 6))
    }.toSeq.sortBy { case (id, _, w) => (-w, id) }.take(50)
  }

  private lazy val dsir =
    ExtensionQueries.x105_dsir(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

  test("x105: distributed top-50 == independent driver DSIR replay") {
    val ref = dsirReference()
    assert(dsir.length == 50)
    assert(dsir.toSeq == ref,
      s"first mismatch: ${dsir.toSeq.zip(ref).find(p => p._1 != p._2)}")
  }

  test("x105: selection is target-seeking (majority of top-50 is en)") {
    val langs = Tables.documents(spark, sf).select("doc_id", "lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val nEn = dsir.count(d => langs(d._1) == "en")
    // 218/500 docs are en at sf0.001; a target-blind scorer would pick
    // ~22 of 50. The LLR scorer must do materially better.
    assert(nEn >= 30, s"only $nEn/50 selected docs are en")
  }

  // --- x133 hierarchical mixture ------------------------------------------

  private lazy val hier =
    ExtensionQueries.x133_mix_hier(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))

  test("x133: within-language epochs are uniform and equal x104's") {
    val x104epochs = unimax.map(u => u._1 -> u._5).toMap
    hier.groupBy(_._1).foreach { case (lang, cells) =>
      val eps = cells.map(_._5).distinct
      assert(eps.size == 1,
        s"$lang: proportional split must not distort within-language epochs, got $eps")
      assert(math.abs(eps.head - x104epochs(lang)) < 2e-6,
        s"$lang: hierarchical epochs ${eps.head} != x104 ${x104epochs(lang)}")
    }
  }

  test("x133: cell allocations conserve each language's UniMax budget") {
    val x104alloc = unimax.map(u => u._1 -> u._4).toMap
    hier.groupBy(_._1).foreach { case (lang, cells) =>
      val s = cells.map(_._4).sum
      assert(math.abs(s - x104alloc(lang)) <= cells.size * 5e-5 + 1e-6,
        s"$lang: cells sum to $s, language budget ${x104alloc(lang)}")
    }
    // and the cells cover every (lang, source) with tokens
    assert(hier.length > 50, s"only ${hier.length} cells")
  }

  // --- x139 epoch manifest --------------------------------------------------

  test("x139: manifest == driver materialization of x133's fractional epochs") {
    val plan = ExtensionQueries.x133_mix_hier(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(4)).toMap
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "lang", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        tok(r.getString(3)).size.toLong))
    def u(id: Long) = {
      val h = md5hex(s"epoch|$id")
      (java.lang.Long.parseLong(h.substring(0, 15), 16) + 1).toDouble /
        1.152921504606846976e18
    }
    val expect = docs.groupBy(d => (d._2, d._3)).toSeq.map { case ((l, s), ds) =>
      val e = plan((l, s))
      val full = math.floor(e).toLong
      val frac = e - math.floor(e)
      val inFrac = ds.filter(d => u(d._1) <= frac)
      (l, s, ds.length.toLong, e, full, inFrac.length.toLong,
        full * ds.map(_._4).sum + inFrac.map(_._4).sum)
    }.sortBy(t => (t._1, t._2))
    val got = ExtensionQueries.x139_epoch_manifest(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == expect,
      s"first mismatch: ${got.zip(expect).find(p => p._1 != p._2)}")
  }

  test("x139: delivered budget tracks the plan's allocation corpus-wide") {
    val planAlloc = ExtensionQueries.x133_mix_hier(spark, sf).collect()
      .map(_.getDouble(3)).sum
    val sched = ExtensionQueries.x139_epoch_manifest(spark, sf).collect()
      .map(_.getLong(6)).sum.toDouble
    // the fractional passes are hash-Bernoulli samples of their cells,
    // so the delivered total concentrates on the planned total
    assert(math.abs(sched - planAlloc) / planAlloc < 0.05,
      s"manifest delivers $sched tokens vs planned $planAlloc")
  }

  // --- x125 negative sampling -------------------------------------------

  private lazy val negTable =
    ExtensionQueries.x125_neg_sampling(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))

  test("x125: noise distribution normalizes and the bank is fully spent") {
    val pSum = negTable.map(_._3).sum
    // each p_ns is rounded to 6 dp, so the sum can drift by vocab*5e-7
    assert(math.abs(pSum - 1.0) <= negTable.length * 5e-7 + 1e-9,
      s"p_ns sums to $pSum")
    assert(negTable.map(_._4).sum == 2000L,
      "bank draws lost or duplicated across tokens")
  }

  test("x125: table == independent driver replay (counts, CDF, every draw)") {
    // recount the corpus driver-side from raw text — nothing shared
    // with the distributed plan but the data
    val texts = Tables.documents(spark, sf).select("text")
      .collect().map(_.getString(0))
    val counts = scala.collection.mutable.Map[String, Long]()
    texts.foreach(t => tok(t).foreach(w =>
      counts(w) = counts.getOrElse(w, 0L) + 1L))
    val vocab = counts.keys.toSeq.sorted
    def p75(c: Long) = { val d = c.toDouble; math.sqrt(math.sqrt(d * d * d)) }
    val z = vocab.map(w => p75(counts(w))).sum
    var acc = 0.0
    val cdf = vocab.map { w =>
      val p = p75(counts(w)) / z
      acc += p
      (w, p, round(acc, 12))
    }
    val draws = scala.collection.mutable.Map[String, Long]()
    (0L until 2000L).foreach { i =>
      val h = md5hex(s"negsample|$i")
      val v = java.lang.Long.parseLong(h.substring(0, 15), 16)
      val u = (v + 1).toDouble / 1.152921504606846976e18
      val w = cdf.find(_._3 >= u).map(_._1).getOrElse(vocab.last)
      draws(w) = draws.getOrElse(w, 0L) + 1L
    }
    val expect = cdf.map { case (w, p, _) =>
      (w, counts(w), round(p, 6), draws.getOrElse(w, 0L))
    }
    assert(negTable.toSeq == expect,
      s"first mismatch: ${negTable.toSeq.zip(expect).find(p => p._1 != p._2)}")
  }

  test("x125: bank fidelity — draw shares track the smoothed distribution") {
    negTable.filter(_._3 >= 0.02).foreach { case (w, _, p, n) =>
      val tol = 5 * math.sqrt(p * (1 - p) / 2000)
      assert(math.abs(n / 2000.0 - p) <= tol,
        s"$w: share ${n / 2000.0} vs p $p (tol $tol)")
    }
  }
}
