package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.VectorizeStream

class VectorizeStreamSpec extends AnyFunSuite with SparkSpec {

  test("streaming vectorizer matches the batch multi-language pipeline (q32 core)") {
    val work = Files.createTempDirectory("graft_vstream")
    val docsDir = work.resolve("docs")
    Files.createDirectory(docsDir)
    Files.createSymbolicLink(docsDir.resolve("documents.parquet"),
      Paths.get(s"$sf/documents.parquet"))
    val store = work.resolve("store").toString
    val ckpt = work.resolve("ckpt").toString

    // the per-language dimension (one table per language, stacked) —
    // the stream vectorizes EVERY language, like the reference's
    // one-worker-per-language fleet in a single plan
    val wvl = graft.queries.ReferenceQueries.wordvecsByLang(spark, sf)

    val q = VectorizeStream.start(spark, docsDir.toString, wvl, 8,
      store, ckpt)
    q.quiesce()

    val streamed = spark.read.parquet(store)
    val batch = graft.queries.ReferenceQueries.docVectorsByLang(
      Tables.documents(spark, sf), wvl, 8)
    assert(streamed.count() === batch.count())

    // values match the oracle-checked batch core (q32 is its
    // hash-verified projection): per-doc lang, known_ratio and l2 norm
    // rounded with the same floor-formula the queries use
    def r6(c: org.apache.spark.sql.Column) = floor(c * 1e6 + lit(0.5)) / 1e6
    def keyed(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
      col("lang"), r6(col("known_ratio")).as("kr"),
      r6(sqrt(graft.functions.VecMath.dot(col("vec"), col("vec")))).as("nrm"))
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val s = keyed(streamed)
    val b = keyed(batch.select("doc_id", "lang", "known_ratio", "vec"))
    assert(s === b)
    // the corpus is genuinely mixed: several languages flowed through
    assert(streamed.select("lang").distinct().count() >= 3)

    // re-running the same stream (fresh checkpoint) is idempotent
    val q2 = VectorizeStream.start(spark, docsDir.toString, wvl, 8,
      store, work.resolve("ckpt2").toString)
    q2.quiesce()
    assert(spark.read.parquet(store).count() === batch.count())
  }

  test("upsertStore swap recovers the store from every crash window") {
    import spark.implicits._
    def store(dir: java.nio.file.Path) = dir.resolve("vectors").toString
    def ids(path: String): Set[Long] =
      spark.read.parquet(path).select("doc_id").as[Long].collect().toSet
    def upsert(path: String, docIds: Long*): Unit =
      VectorizeStream.upsertStore(spark,
        docIds.map(i => (i, 1.0, Array(i.toFloat))).toDF("doc_id", "known_ratio", "vec"),
        path)

    // crash AFTER store->retired, BEFORE tmp->store: the store is
    // missing but .retired holds the accepted history — the replayed
    // batch must restore it and re-merge, not start a fresh store
    // (the old delete-then-move swap lost all prior batches here)
    val w1 = Files.createTempDirectory("graft_swap1")
    upsert(store(w1), 1L, 2L)
    Files.move(Paths.get(store(w1)), Paths.get(store(w1) + ".retired"))
    upsert(store(w1), 3L)
    assert(ids(store(w1)) === Set(1L, 2L, 3L))
    assert(!Files.exists(Paths.get(store(w1) + ".retired")))

    // crash AFTER tmp->store, BEFORE retired cleanup: the swap
    // completed — recovery discards the stale .retired and the
    // replayed batch re-merges idempotently
    val w2 = Files.createTempDirectory("graft_swap2")
    upsert(store(w2), 1L, 2L)
    upsert(store(w2), 3L)
    val stale = Paths.get(store(w2) + ".retired")
    Files.createDirectory(stale)
    Files.write(stale.resolve("junk"), Array[Byte](1))
    upsert(store(w2), 3L)
    assert(ids(store(w2)) === Set(1L, 2L, 3L))
    assert(!Files.exists(stale))
  }

  test("restart from the SAME checkpoint processes only newly-arrived files") {
    val work = Files.createTempDirectory("graft_vresume")
    val docsDir = work.resolve("docs")
    Files.createDirectory(docsDir)
    val store = work.resolve("store").toString
    val ckpt = work.resolve("ckpt").toString
    val wordvecs = graft.queries.ReferenceQueries.wordvecsByLang(spark, sf)

    // stage the corpus as two disjoint halves, arriving one at a time
    def stage(name: String, cond: org.apache.spark.sql.Column): Long = {
      val tmp = work.resolve(s"stage_$name")
      val half = Tables.documents(spark, sf).filter(cond)
      half.coalesce(1).write.parquet(tmp.toString)
      val part = Files.list(tmp).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).head
      Files.copy(Paths.get(part), docsDir.resolve(s"$name.parquet"))
      half.count()
    }
    val n1 = stage("a", col("doc_id") < 250)

    val q1 = VectorizeStream.start(spark, docsDir.toString, wordvecs, 8,
      store, ckpt)
    q1.quiesce()
    val rows1 = q1.recentProgress.map(_.numInputRows).sum
    assert(rows1 === n1, s"first run should ingest exactly file a ($n1 rows)")

    val n2 = stage("b", col("doc_id") >= 250)
    val q2 = VectorizeStream.start(spark, docsDir.toString, wordvecs, 8,
      store, ckpt) // SAME checkpoint — offsets must resume
    q2.quiesce()
    val rows2 = q2.recentProgress.map(_.numInputRows).sum
    assert(rows2 === n2,
      s"resumed run must ingest only file b ($n2 rows), got $rows2 — file a reprocessed?")

    // final store equals the oracle-checked batch pipeline over the full corpus
    val batch = graft.queries.ReferenceQueries.docVectorsByLang(
      Tables.documents(spark, sf), wordvecs, 8)
    assert(spark.read.parquet(store).count() === batch.count())
  }
}
