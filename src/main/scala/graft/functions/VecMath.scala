package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float|double>` columns, built from Catalyst
  * higher-order functions (`zip_with`/`aggregate`/`transform`) so the hot
  * path stays codegen'd — no UDFs (SURVEY.md §2.9, cosine extension).
  *
  * All math is done in double; `aggregate` folds left over the array in
  * element order, which is deterministic and matches a sequential SQL
  * fold — required for DuckDB-oracle hash parity.
  */
object VecMath {
  /** Cast an array<float> (or any numeric array) to array<double>. */
  def asDouble(a: Column): Column = transform(a, x => x.cast("double"))

  /** Elementwise a + b (reference `worker.py:83` accumulate). */
  def add(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x + y)

  /** Elementwise scale (reference `worker.py:83` tf*idf*vec). */
  def scale(a: Column, s: Column): Column = transform(a, x => x * s)

  /** Sequential dot product — native codegen expression (the HOF form
    * `aggregate(zip_with(...))` allocates per row and evaluates lambdas
    * per element; see [[DotProduct]]).
    */
  def dot(a: Column, b: Column): Column = DotProduct(a, b)

  /** Sum of elements. */
  def vsum(a: Column): Column = aggregate(a, lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity with zero-norm guard (0.0 like the reference's
    * guarded divisions, `worker.py:91` pattern F7).
    */
  def cosine(a: Column, b: Column): Column = {
    val na = l2norm(a); val nb = l2norm(b)
    when(na > 0.0 && nb > 0.0, dot(a, b) / (na * nb)).otherwise(lit(0.0))
  }

  /** Zero vector of dimension d (reference `worker.py:78` np.zeros). */
  def zeros(d: Int): Column = array_repeat(lit(0.0), d)
}
