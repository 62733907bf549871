package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VecMath
import graft.queries.ExtensionQueries

/** Round-10 verdict ask #5: MMR in its GROUPED form — the greedy must
  * run per query inside executors (flatMapGroups over bounded
  * candidate sets), and its per-query output must equal the
  * driver-side greedy x93 runs, for EVERY query in a multi-query
  * fixture. Query 0 doubles as the x93 identity (same query vector,
  * same candidates, same k).
  */
class MmrBatchSpec extends AnyFunSuite with SparkSpec {

  private val qids = Seq(0L, 1L, 2L, 3L)

  test("batch MMR query 0 is x93 verbatim") {
    val batch0 = ExtensionQueries.x98_mmr_batch(spark, sf)
      .filter(col("query_id") === 0)
      .select("rank", "doc_id", "relevance", "mmr").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    val single = ExtensionQueries.x93_mmr_rerank(spark, sf)
      .select("rank", "doc_id", "relevance", "mmr").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    assert(batch0 === single, "grouped greedy diverges from x93 for query 0")
    assert(single.length === 10)
  }

  test("every query's grouped greedy equals the driver greedy replay") {
    val got = ExtensionQueries.x98_mmr_batch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
      .groupBy(_._1)

    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), VecMath.asDouble(col("embedding")).as("v"),
        VecMath.l2norm(VecMath.asDouble(col("embedding"))).as("nrm"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))

    def round6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

    for (qid <- qids) {
      val (_, qv, qn) = e.find(_._1 == qid).get
      val cand = e.filter(_._1 != qid)
        .map { case (id, v, nrm) =>
          val cos = if (qn > 0 && nrm > 0)
            v.zip(qv).map { case (a, b) => a * b }.sum / (qn * nrm)
          else 0.0
          (id, cos, v, nrm)
        }
        .sortBy(t => (-t._2, t._1)).take(20)
      val exp = ExtensionQueries.mmrGreedy(cand, 10)
        .map { case (rank, doc, rel, mmr) =>
          (qid, rank, doc, round6(rel), round6(mmr))
        }
      assert(got(qid).toSeq.sortBy(_._2) === exp,
        s"grouped greedy diverges from the driver replay for query $qid")
    }
    assert(got.keySet === qids.toSet)
  }
}
