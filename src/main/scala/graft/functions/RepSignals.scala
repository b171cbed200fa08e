package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.unsafe.types.UTF8String

/** Row-local repetition signals in ONE pass over the tokens — the
  * native twin of `TextFns.dupGramFrac` + `TextFns.topTokenFrac`
  * (value-identical, RepSignalsSpec): duplicate n-gram fraction
  * (1 − distinct/total over ALL n-gram occurrences) and
  * most-frequent-token share, both rounded to 6 like the Column
  * forms.
  *
  * The Column forms compose transform/element_at/concat_ws/
  * array_distinct/aggregate — Catalyst evaluates those higher-order
  * lambdas INTERPRETED per element, and the flag projection consumes
  * the signal columns multiple times, so the full-evaluation pass
  * cost 122 s at sf0.1. One codegen'd call per row brings it back
  * into whole-stage codegen (~2 s).
  */
object RepSignalsNative {

  private def round6(v: Double): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** (dup_ngram_frac, top_token_frac) as an InternalRow. */
  def repSignals(text: UTF8String, n: Int,
      useICU: Boolean): InternalRow = {
    val toks = TextHash.tokensOf(text, useICU)
    val total = toks.length
    // top token share
    var topFrac = 0.0
    if (total > 0) {
      val counts = new java.util.HashMap[String, Integer](total * 2)
      var top = 0
      var i = 0
      while (i < total) {
        val c = counts.merge(toks(i), 1, (a, b) => a + b)
        if (c > top) top = c
        i += 1
      }
      topFrac = round6(top.toDouble / total)
    }
    // duplicate n-gram fraction
    var dupFrac = 0.0
    val g = total - n + 1
    if (g > 0) {
      val seen = new java.util.HashSet[String](g * 2)
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < g) {
        sb.setLength(0)
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(toks(i + k))
          k += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      dupFrac = round6(1.0 - seen.size.toDouble / g)
    }
    InternalRow(dupFrac, topFrac)
  }
}

/** `repSignals(text, n)` → struct<dup_frac:double, top_frac:double>. */
case class RepSignals(child: Expression, n: Int,
    useICU: Boolean = TextHash.resolveUseICU()) extends UnaryExpression {
  require(n >= 2, s"need n >= 2, got $n")
  override def dataType: DataType = StructType(Seq(
    StructField("dup_frac", DoubleType, false),
    StructField("top_frac", DoubleType, false)))
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RepSignalsNative.repSignals($c, $n, $useICU)")
  override def nullSafeEval(v: Any): Any =
    RepSignalsNative.repSignals(v.asInstanceOf[UTF8String], n, useICU)
  override protected def withNewChildInternal(c: Expression): RepSignals =
    copy(child = c)
}

object RepSignals {
  def apply(text: Column, n: Int): Column =
    ColumnGlue.column(RepSignals(ColumnGlue.expression(text), n))
}
