package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe
import graft.queries.ExtensionQueries

/** Accuracy contract for the rows-only x79 (Bpe.train): the Spark
  * implementation must equal a straightforward single-node reference
  * implementation of the published BPE algorithm — same greedy
  * frequency-weighted argmax, same lexicographic tie-break, same
  * left-to-right merge application — on a handcrafted fixture AND on
  * the real corpus word-frequency table, plus determinism and
  * encode-consistency properties.
  */
class BpeSpec extends AnyFunSuite with SparkSpec {

  /** Single-node reference: the classic dictionary formulation. */
  private def refTrain(words: Map[String, Long], k: Int): Seq[Bpe.Merge] = {
    var state: Vector[(Vector[String], Long)] = words.toVector.sortBy(_._1)
      .map { case (w, f) => (w.split("").filter(_.nonEmpty).toVector :+ Bpe.Eow, f) }
    val out = scala.collection.mutable.ArrayBuffer.empty[Bpe.Merge]
    var done = false
    while (!done && out.size < k) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- state; i <- 0 until syms.size - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        if (c < 2L) done = true
        else {
          out += Bpe.Merge(out.size + 1, l, r, l + r, c)
          state = state.map { case (syms, f) =>
            val b = scala.collection.mutable.ArrayBuffer.empty[String]
            for (s <- syms) {
              if (b.nonEmpty && b.last == l && s == r) b(b.size - 1) = l + r
              else b += s
            }
            (b.toVector, f)
          }
        }
      }
    }
    out.toSeq
  }

  private def sparkTrain(words: Map[String, Long], k: Int): Seq[Bpe.Merge] = {
    val df = spark.createDataFrame(words.toSeq).toDF("token", "freq")
    Bpe.train(spark, df, k)._1
  }

  test("classic fixture: spark merges equal the reference implementation") {
    val words = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val ref = refTrain(words, 10)
    assert(ref.nonEmpty)
    assert(sparkTrain(words, 10) === ref)
  }

  test("tie-break fixture: equal counts resolve lexicographically on both sides") {
    // "ab" and "cd" both occur exactly 3 times — (a,b) must win over (c,d)
    val words = Map("ab" -> 3L, "cd" -> 3L)
    val ref = refTrain(words, 4)
    val got = sparkTrain(words, 4)
    assert(got === ref)
    assert(got.head.left == "a" && got.head.right == "b")
  }

  test("early stop: a vocabulary with no repeatable pair learns nothing past it") {
    // freq-1 singleton words: every pair count is 1 => zero merges
    assert(sparkTrain(Map("xy" -> 1L, "zq" -> 1L), 5) === Seq.empty)
  }

  test("corpus equivalence: x79 merge table equals the reference on sf0.001 counts") {
    val words = Tables.documents(spark, sf)
      .select(explode(graft.functions.Tokenize.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ref = refTrain(words, 20)
    val got = ExtensionQueries.x79_bpe_train(spark, sf).collect().map(r =>
      Bpe.Merge(r.getLong(0).toInt, r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(ref.nonEmpty, "corpus should produce at least one merge")
    assert(got === ref)
  }

  test("delta maintenance == full recount over 100+ merges on the corpus vocabulary") {
    // the delta trainer (batch=1 isolates the pair-count maintenance
    // from batching) must equal the ground-truth full-recount trainer
    // at every one of 100+ steps — any drift in the −old/+new update
    // desynchronizes an argmax somewhere in a table this deep
    val words = Tables.documents(spark, sf)
      .select(explode(graft.functions.Tokenize.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
    val (recount, _) = Bpe.trainRecount(spark, words, 100)
    assert(recount.size === 100, "corpus must support 100 merges")
    // cutoff 0 forces the delta path (the corpus vocab is small, so
    // the default would delegate to recount and test nothing)
    val (delta, _) = Bpe.train(spark, words, 100, batch = 1,
      smallVocabCutoff = 0)
    assert(delta === recount)
  }

  test("batched admission == sequential greedy over 100+ merges") {
    val words = Tables.documents(spark, sf)
      .select(explode(graft.functions.Tokenize.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
    val (seq1, _) = Bpe.train(spark, words, 104, batch = 1,
      smallVocabCutoff = 0)
    val (seq8, _) = Bpe.train(spark, words, 104, batch = 8,
      smallVocabCutoff = 0)
    assert(seq8 === seq1)
  }

  test("determinism: two runs produce identical merge tables") {
    val words = Map("seen" -> 4L, "seed" -> 3L, "need" -> 2L, "den" -> 7L)
    assert(sparkTrain(words, 8) === sparkTrain(words, 8))
  }

  test("x87 per-doc bpe token counts equal the single-node reference") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), graft.functions.Tokenize.tokens(col("text")).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val freq: Map[String, Long] = docs.values.flatten
      .groupBy(identity).map { case (w, o) => w -> o.size.toLong }
    val merges = refTrain(freq, 20)
    assert(merges.nonEmpty)
    def encodeWord(w: String): Long = {
      var syms: Vector[String] = w.split("").filter(_.nonEmpty).toVector :+ Bpe.Eow
      for (m <- merges) {
        val b = scala.collection.mutable.ArrayBuffer.empty[String]
        for (s <- syms) {
          if (b.nonEmpty && b.last == m.left && s == m.right) b(b.size - 1) = m.merged
          else b += s
        }
        syms = b.toVector
      }
      syms.size.toLong
    }
    val pieceOf = freq.keysIterator.map(w => w -> encodeWord(w)).toMap
    val expect = docs.map { case (id, toks) =>
      id -> ((toks.size.toLong, toks.iterator.map(pieceOf).sum)) }
    val got = ExtensionQueries.x87_bpe_tokenize(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expect)
    // and at least one word actually compresses (pieces < chars + eow)
    assert(pieceOf.exists { case (w, p) => p < w.length + 1 })
  }

  test("encode applies the learned table: concatenating symbols restores the word") {
    val words = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val df = spark.createDataFrame(words.toSeq).toDF("token", "freq")
    val (merges, finalState) = Bpe.train(spark, df, 10)
    val enc = Bpe.encode(df, merges)
    // encode over the training words == the final training state
    val a = enc.select("token", "syms").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val b = finalState.select("token", "syms").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(a === b)
    // and the symbols of each word concatenate back to word + </w>
    for ((w, syms) <- a) assert(syms.mkString("") === w + Bpe.Eow)
  }

  test("x130 fertility report == driver regroup of x87's per-doc frame") {
    val sfDir = sf
    val perDoc = graft.queries.ExtensionQueries.x87_bpe_tokenize(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val meta = Tables.documents(spark, sfDir).select("doc_id", "lang", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val langOf = meta.map(m => m._1 -> m._2).toMap
    val charsOf = meta.map { case (id, _, t) =>
      id -> t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
        .map(_.length.toLong).sum
    }.toMap
    def rnd(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    val expect = perDoc.filter(_._2 > 0).groupBy(d => langOf(d._1))
      .map { case (lang, ds) =>
        val (w, p) = (ds.map(_._2).sum, ds.map(_._3).sum)
        val c = ds.map(d => charsOf(d._1)).sum
        (lang, ds.length.toLong, w, p, rnd(p.toDouble / w), rnd(c.toDouble / p))
      }.toSeq.sortBy(_._1)
    val got = graft.queries.ExtensionQueries.x130_bpe_fertility(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == expect,
      s"first mismatch: ${got.zip(expect).find(p => p._1 != p._2)}")
    assert(got.map(_._1).distinct.size >= 3, "fixture spans too few languages")
  }
}
