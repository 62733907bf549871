package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native token counting (SURVEY.md §2.9 — the codegen'd hot-path form
  * of F2's counting use).
  *
  * `size(Tokenize.tokens(text))` materializes the full token ARRAY
  * (regex split + filter + array alloc) just to take its length; for
  * per-document token budgets over a 100 TB scan that allocation is
  * the cost. `TokenCount` is a single pass over the UTF8String's bytes
  * counting maximal `[A-Za-z0-9]` runs — no regex, no allocation, and
  * `doGenCode` keeps it inside whole-stage codegen. Measured (sf0.1,
  * Scratch `tokencount`): 0.21 s vs 0.32 s warm and 0.37 s vs 4.6 s
  * cold against the array form (the cold gap is regex/JIT machinery
  * the byte loop never touches).
  *
  * The raw byte scan alone matches `size(tokens(text))` for ASCII and
  * for almost all Unicode — but not for the handful of code points
  * whose LOWERCASE form maps into ASCII (KELVIN SIGN → 'k', İ → 'i…'):
  * the tokenizer sees those as letters after `lower()`, the byte scan
  * would not. The Column form therefore applies the codegen'd
  * `lower()` first, which restores EXACT equivalence for any input
  * (after lowering, ASCII alnum bytes are alnum and every other byte
  * is a separator under both definitions) — TokenCountSpec pins it by
  * property test including those code points.
  */
case class TokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any =
    TokenCount.count(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenCount.count($c);")
  override protected def withNewChildInternal(c: Expression): TokenCount =
    copy(child = c)
  override def prettyName: String = "graft_token_count"
}

object TokenCount {
  def apply(c: Column): Column =
    ColumnShim.column(TokenCount(ColumnShim.expression(
      org.apache.spark.sql.functions.lower(c))))

  def count(s: UTF8String): Int = {
    val n = s.numBytes()
    var i = 0
    var cnt = 0
    var inRun = false
    while (i < n) {
      val b = s.getByte(i).toInt
      val alnum = (b >= 'a'.toInt && b <= 'z'.toInt) ||
        (b >= 'A'.toInt && b <= 'Z'.toInt) ||
        (b >= '0'.toInt && b <= '9'.toInt)
      if (alnum) {
        if (!inRun) { cnt += 1; inRun = true }
      } else inRun = false
      i += 1
    }
    cnt
  }
}
