package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.IdfStream

/** The streamed, state-folding idf table must equal the oracle-checked
  * full recompute (q11) after the corpus arrives file-by-file across
  * multiple micro-batches.
  */
class IdfStreamSpec extends AnyFunSuite with SparkSpec {

  test("multi-batch streamed idf state equals the batch full recompute") {
    val work = Files.createTempDirectory("graft_idfstream")
    val docsDir = work.resolve("docs").toString
    // 3 files -> 3 micro-batches (maxFilesPerTrigger = 1): the state
    // fold must be associative across batch boundaries
    Tables.documents(spark, sf).repartition(3)
      .write.parquet(docsDir)
    val stateDir = work.resolve("state").toString
    val ckpt = work.resolve("ckpt").toString

    val q = IdfStream.start(spark, docsDir, stateDir, ckpt)
    q.quiesce()

    val streamed = IdfStream.currentIdf(spark, stateDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val batch = graft.queries.ReferenceQueries.q11_idf(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(streamed.nonEmpty)
    assert(streamed.toSeq === batch.toSeq)
  }

  test("restart from the same checkpoint extends state without double-counting") {
    import org.apache.spark.sql.functions._
    val work = Files.createTempDirectory("graft_idfresume")
    val docsDir = work.resolve("docs").toString
    val stateDir = work.resolve("state").toString
    val ckpt = work.resolve("ckpt").toString
    val docs = Tables.documents(spark, sf)

    // first run: half the corpus
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write
      .mode("append").parquet(docsDir)
    IdfStream.start(spark, docsDir, stateDir, ckpt).quiesce()
    val half = IdfStream.currentIdf(spark, stateDir).count()
    assert(half > 0)

    // second run, SAME checkpoint: only the newly-arrived file may
    // contribute a delta — if the first file replayed into NEW state,
    // occurrence counts would double and the comparison below would fail
    docs.filter(col("doc_id") % 2 =!= 0).coalesce(1).write
      .mode("append").parquet(docsDir)
    IdfStream.start(spark, docsDir, stateDir, ckpt).quiesce()

    val streamed = IdfStream.currentIdf(spark, stateDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val full = graft.queries.ReferenceQueries.q11_idf(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(streamed.toSeq === full.toSeq)
  }
}
