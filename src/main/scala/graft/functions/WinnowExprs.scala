package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftglue.ColumnGlue

/** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken,
  * SIGMOD 2003 — the MOSS algorithm): slide a window of `w`
  * consecutive gram hashes and keep the minimum of each window
  * (RIGHTMOST occurrence on ties, the paper's robust-winnowing tie
  * rule), deduplicating consecutive selections of the same position.
  *
  * Guarantee: any substring match of at least w + k − 1 tokens (k =
  * the gram size of the hash sequence) shares at least one selected
  * fingerprint, while the expected index density is 2/(w+1) — the
  * ~w/2× fingerprint-volume reduction that makes a corpus-wide
  * fingerprint index affordable where [[ImportanceNative.gramHashSeq]]
  * alone (every window, as `Dedup.dupSpans` consumes it) would not
  * be. Composes as WinnowSelect(GramHashSeq(text, k), w), so the
  * hash family stays the md5-fold the DuckDB oracle replays.
  *
  * Single O(n) pass with a monotonic index deque: back-pops on
  * `hs(back) >= hs(new)` keep the front the rightmost minimum of the
  * current window. A document with fewer than `w` windows yields one
  * fingerprint (the minimum of everything) — shorter documents are
  * still indexed rather than silently dropped.
  */
object WinnowNative {
  def winnowSelect(hashes: ArrayData, w: Int): GenericArrayData = {
    val m = hashes.numElements()
    if (m == 0) return new GenericArrayData(Array.empty[Any])
    val hs = hashes.toLongArray()
    val deque = new Array[Int](m)
    var head = 0
    var tail = 0 // deque is [head, tail)
    val out = new java.util.ArrayList[Any]()
    var lastPos = -1
    val firstEnd = math.min(w, m) - 1
    var end = 0
    while (end < m) {
      while (tail > head && hs(deque(tail - 1)) >= hs(end)) tail -= 1
      deque(tail) = end
      tail += 1
      if (end >= firstEnd) {
        val start = math.max(0, end - w + 1)
        while (deque(head) < start) head += 1
        val sel = deque(head)
        if (sel != lastPos) {
          out.add(new GenericInternalRow(
            Array[Any](sel, hs(sel))))
          lastPos = sel
        }
      }
      end += 1
    }
    new GenericArrayData(out.toArray)
  }
}

case class WinnowSelect(child: Expression, w: Int)
  extends UnaryExpression {
  require(w >= 1, s"window must be >= 1, got $w")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("h", LongType, nullable = false))), containsNull = false)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowNative.winnowSelect($c, $w)")
  override def nullSafeEval(v: Any): Any =
    WinnowNative.winnowSelect(v.asInstanceOf[ArrayData], w)
  override protected def withNewChildInternal(c: Expression): WinnowSelect =
    copy(child = c)
}

object WinnowSelect {
  def apply(hashes: Column, w: Int): Column =
    ColumnGlue.column(WinnowSelect(ColumnGlue.expression(hashes), w))
}
