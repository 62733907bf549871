package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-safe equi-join by salting (the manual fallback when AQE's
  * skew-join split can't apply, e.g. bucketed inputs or non-sort-merge
  * plans).
  *
  * The probe (large, skewed) side gets a per-row salt in [0, S); the
  * build side is replicated S times; the join key becomes (key, salt),
  * spreading a hot key over S reducers. Result set is identical to the
  * plain join — only the physical distribution changes.
  */
object SkewJoin {
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      salt: Int): DataFrame = {
    val saltCol = "__graft_salt"
    // deterministic per-row spread: hash of the whole row modulo S
    // (rand() would break retry/idempotence semantics on task replay)
    val probeS = probe.withColumn(saltCol,
      pmod(hash(probe.columns.map(col).toIndexedSeq: _*), lit(salt)))
    val buildS = build.withColumn(saltCol,
      explode(sequence(lit(0), lit(salt - 1))))
    probeS.join(buildS, Seq(key, saltCol)).drop(saltCol)
  }
}
