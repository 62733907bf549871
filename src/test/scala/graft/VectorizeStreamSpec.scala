package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.VectorizeStream

class VectorizeStreamSpec extends AnyFunSuite with SparkSpec {

  test("streaming vectorizer produces the same doc vectors as batch q12") {
    val work = Files.createTempDirectory("graft_vstream")
    val docsDir = work.resolve("docs")
    Files.createDirectory(docsDir)
    Files.createSymbolicLink(docsDir.resolve("documents.parquet"),
      Paths.get(s"$sf/documents.parquet"))
    val store = work.resolve("store").toString
    val ckpt = work.resolve("ckpt").toString

    // the exact q12 word-vector dim table (8-dim pseudo vectors + idf)
    val wordvecs = graft.queries.ReferenceQueries.wordvecs8(spark, sf)

    val q = VectorizeStream.start(spark, docsDir.toString, wordvecs, 8,
      store, ckpt)
    q.awaitTermination(180000)

    val streamed = spark.read.parquet(store)
    val batch = graft.queries.ReferenceQueries.q12_doc_vectors(spark, sf)
    assert(streamed.count() === batch.count())

    // values match the oracle-checked batch pipeline (norms rounded with
    // the same floor-formula the queries use — see ReferenceQueries.round)
    def r6(c: org.apache.spark.sql.Column) = floor(c * 1e6 + lit(0.5)) / 1e6
    val s = streamed.select(col("doc_id"),
      r6(col("known_ratio")).as("kr"),
      r6(sqrt(graft.functions.VecMath.dot(col("vec"), col("vec")))).as("nrm"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val b = batch.collect().map { r =>
      r.getLong(0) -> (r.getDouble(1), Option(r.get(3)).map(_.asInstanceOf[Double]))
    }.toMap
    assert(s.keySet === b.keySet)
    for ((id, (kr, nrm)) <- s) {
      assert(kr === b(id)._1, s"known_ratio doc $id")
      b(id)._2.foreach(expected => assert(nrm === expected, s"norm doc $id"))
    }

    // re-running the same stream (fresh checkpoint) is idempotent
    val q2 = VectorizeStream.start(spark, docsDir.toString, wordvecs, 8,
      store, work.resolve("ckpt2").toString)
    q2.awaitTermination(180000)
    assert(spark.read.parquet(store).count() === batch.count())
  }
}
