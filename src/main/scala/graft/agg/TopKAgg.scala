package graft.agg

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored item: the input row AND the buffer element of [[TopK]]. */
case class Scored(score: Long, item: String)

/** One weighted-race entry: the exponential race key, the candidate's
  * id, and the weight it raced with (carried through so the sample
  * row can report it without re-joining the source).
  */
case class Race(key: Double, id: Long, w: Double)

/** The bounded per-group k-selection state machine shared by [[TopK]]
  * and [[BottomK]] — only the order differs between them.
  *
  * The window form (`row_number().over(partitionBy(key)) <= k`) sorts
  * EVERY group's full row set, and `collect_list`-then-slice holds the
  * whole group in memory before trimming — both are fine at bench
  * scale and wrong at 100 TB, where a hot key's group is unbounded.
  * This `Aggregator` keeps at most k elements through `reduce` AND
  * `merge`, so per-(partition, group) state is O(k), map-side partials
  * ship k rows each, and the final merge touches k·partitions rows per
  * key — the bounded-heap shape a distributed k-selection wants. k is
  * small by construction; the per-insert sort is O(k log k) on a k+1
  * buffer, not a data-sized cost.
  *
  * `better(a, b)` must be a strict total order (antisymmetric,
  * transitive) — it is both the selection rule and the output order,
  * so subclasses tie-break to totality to stay engine-independent.
  */
abstract class BoundedK[T: TypeTag](k: Int)
    extends Aggregator[T, Seq[T], Seq[T]] {
  require(k >= 1, s"k must be >= 1, got $k")

  protected def better(a: T, b: T): Boolean

  private def trim(s: Seq[T]): Seq[T] = s.sortWith(better).take(k)

  override def zero: Seq[T] = Seq.empty
  override def reduce(buf: Seq[T], in: T): Seq[T] = trim(buf :+ in)
  override def merge(a: Seq[T], b: Seq[T]): Seq[T] = trim(a ++ b)
  override def finish(buf: Seq[T]): Seq[T] = trim(buf)
  override def bufferEncoder: Encoder[Seq[T]] = ExpressionEncoder[Seq[T]]()
  override def outputEncoder: Encoder[Seq[T]] = ExpressionEncoder[Seq[T]]()
}

/** Bounded per-group top-k: the k LARGEST scores.
  *
  * Ordering: score DESC with item ASC tiebreak — identical to the
  * window form x24 uses, which is what lets the x58 oracle be x24's
  * own SQL.
  */
class TopK(k: Int) extends BoundedK[Scored](k) {
  override protected def better(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.item < b.item)
}

/** Bounded per-group BOTTOM-k: the k SMALLEST race keys.
  *
  * Ascending because weighted sampling without replacement
  * (Efraimidis–Spirakis) selects the k smallest exponential variates
  * `-ln(u)/w`: each candidate's key is an Exp(w) draw, the winners of
  * the race are a without-replacement sample with inclusion
  * probability proportional to weight. Tie-break on id keeps the
  * ordering total and engine-independent (x68's oracle sorts the same
  * way).
  */
class BottomK(k: Int) extends BoundedK[Race](k) {
  override protected def better(a: Race, b: Race): Boolean =
    a.key < b.key || (a.key == b.key && a.id < b.id)
}
