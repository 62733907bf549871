package graft.agg

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored item: the input row AND the buffer element of [[TopK]]. */
case class Scored(score: Long, item: String)

/** Bounded per-group top-k aggregation.
  *
  * The window form (`row_number().over(partitionBy(key)) <= k`) sorts
  * EVERY group's full row set, and `collect_list`-then-slice holds the
  * whole group in memory before trimming — both are fine at bench
  * scale and wrong at 100 TB, where a hot key's group is unbounded.
  * This `Aggregator` keeps at most k elements through `reduce` AND
  * `merge`, so per-(partition, group) state is O(k), map-side partials
  * ship k rows each, and the final merge touches k·partitions rows per
  * key — the bounded-heap shape a distributed top-k wants.
  *
  * Ordering: score DESC with item ASC tiebreak — identical to the
  * window form x24 uses, which is what lets the x58 oracle be x24's
  * own SQL. k is small by construction; the per-insert sort is
  * O(k log k) on a k+1 buffer, not a data-sized cost.
  */
class TopK(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  require(k >= 1, s"k must be >= 1, got $k")

  private def better(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.item < b.item)

  private def trim(s: Seq[Scored]): Seq[Scored] = s.sortWith(better).take(k)

  override def zero: Seq[Scored] = Seq.empty
  override def reduce(buf: Seq[Scored], in: Scored): Seq[Scored] =
    trim(buf :+ in)
  override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
    trim(a ++ b)
  override def finish(buf: Seq[Scored]): Seq[Scored] = trim(buf)
  override def bufferEncoder: Encoder[Seq[Scored]] =
    ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] =
    ExpressionEncoder[Seq[Scored]]()
}

/** One weighted-race entry: the exponential race key, the candidate's
  * id, and the weight it raced with (carried through so the sample
  * row can report it without re-joining the source).
  */
case class Race(key: Double, id: Long, w: Double)

/** Bounded per-group BOTTOM-k — the k smallest race keys.
  *
  * Same O(k)-state rationale as [[TopK]] (a window form sorts every
  * group in full; a hot stratum at 100 TB is unbounded), flipped to
  * ascending order because weighted sampling without replacement
  * (Efraimidis–Spirakis) selects the k SMALLEST exponential variates
  * `-ln(u)/w`: each candidate's key is an Exp(w) draw, the winners of
  * the race are a without-replacement sample with inclusion
  * probability proportional to weight. Tie-break on id keeps the
  * ordering total and engine-independent (x68's oracle sorts the same
  * way).
  */
class BottomK(k: Int) extends Aggregator[Race, Seq[Race], Seq[Race]] {
  require(k >= 1, s"k must be >= 1, got $k")

  private def better(a: Race, b: Race): Boolean =
    a.key < b.key || (a.key == b.key && a.id < b.id)

  private def trim(s: Seq[Race]): Seq[Race] = s.sortWith(better).take(k)

  override def zero: Seq[Race] = Seq.empty
  override def reduce(buf: Seq[Race], in: Race): Seq[Race] =
    trim(buf :+ in)
  override def merge(a: Seq[Race], b: Seq[Race]): Seq[Race] =
    trim(a ++ b)
  override def finish(buf: Seq[Race]): Seq[Race] = trim(buf)
  override def bufferEncoder: Encoder[Seq[Race]] =
    ExpressionEncoder[Seq[Race]]()
  override def outputEncoder: Encoder[Seq[Race]] =
    ExpressionEncoder[Seq[Race]]()
}
