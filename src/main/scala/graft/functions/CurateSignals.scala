package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused curation kernel (VERDICT r15 item 3): ONE pass over each
  * document computing BOTH signals the p_curate train-side corpus scan
  * needs —
  *
  *   quality = TextFns.qualityScore(text)        (bit-exact)
  *   key     = md5(Dedup.normalize(text))        (bit-exact)
  *
  * The Column composition derives four separate token passes for the
  * quality score (whitespace split, punct regexp_replace, lowercase +
  * letter split + 21-way isin, length) plus lowercase + ws-collapse +
  * md5 for the dedup key, with the higher-order `filter` steps
  * evaluated interpreted per element. Here the text is lowered ONCE
  * (shared by the stopword tokens and the normalize), each count is an
  * allocation-light scan, and codegen emits a single static call.
  *
  * Bit-exactness is pinned two ways: CurateNativeSpec compares both
  * fields against the Column compositions on adversarial + random
  * strings, and the p_curate oracle gate replays the Column semantics
  * in DuckDB over the same corpus.
  */
object CurateNative {

  private val letterTok = Pattern.compile("[^\\p{L}0-9]+")
  private val stopEn: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    graft.pipeline.TextFns.stopwordsEn.foreach(s.add)
    s
  }
  // the punct class of TextFns.punctCount: [.,;:!?'"()\[\]{}-]
  private val punctSet: Array[Boolean] = {
    val a = new Array[Boolean](128)
    ".,;:!?'\"()[]{}-".foreach(c => a(c) = true)
    a
  }
  private def isWs(c: Char): Boolean = // TextFns.WsRe = [\t\n\f\r ]+
    c == '\t' || c == '\n' || c == '\f' || c == '\r' || c == ' '

  /** quality exactly as TextFns.qualityScore composes it (same
    * operation order, same double arithmetic, Spark round HALF_UP).
    */
  def signals(text: UTF8String, useICU: Boolean): InternalRow = {
    val raw = text.toString
    // nChars: Spark length() = code points
    val nChars = text.numChars().toDouble
    // tokenCount: non-empty pieces of split(text, WsRe) = maximal
    // non-whitespace runs (the ws chars are ASCII, so a char scan is
    // code-point exact)
    var nToks = 0L
    var punct = 0L
    var inTok = false
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (isWs(c)) inTok = false
      else {
        if (!inTok) nToks += 1
        inTok = true
        if (c < 128 && punctSet(c)) punct += 1
      }
      i += 1
    }
    // NB punct chars inside whitespace runs are impossible (disjoint
    // classes), so counting within the same scan is exact.
    val lowered = TextHash.sparkLower(text, useICU).toString
    // stopwordRatio tokens: filter(split(lower(text), "[^\p{L}0-9]+"),
    // length > 0)
    var swTotal = 0L
    var swHits = 0L
    val pieces = letterTok.split(lowered)
    i = 0
    while (i < pieces.length) {
      val t = pieces(i)
      if (t.nonEmpty) {
        swTotal += 1
        if (stopEn.contains(t)) swHits += 1
      }
      i += 1
    }
    // the exact when/least tree of TextFns.qualityScore
    val nToksD = nToks.toDouble
    val meanWord = if (nToksD > 0) nChars / nToksD else 0.0d
    val punctRatio = if (nChars > 0) punct.toDouble / nChars else 0.0d
    val lengthScore = math.min(nToksD / 100.0, 1.0d)
    val wordScore = if (meanWord >= 3 && meanWord <= 12) 1.0d else 0.3d
    val punctScore = if (punctRatio <= 0.1) 1.0d else 0.5d
    val stopRatio =
      if (swTotal > 0) swHits.toDouble / swTotal.toDouble else 0.0d
    val stopScore = math.min(stopRatio * 4, 1.0d)
    val blend = lengthScore * 0.3 + wordScore * 0.3 + punctScore * 0.2 +
      stopScore * 0.2
    // Spark Round on double: BigDecimal.valueOf → setScale HALF_UP
    val quality = java.math.BigDecimal.valueOf(blend)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    // dedup key: md5 hex of Dedup.normalize(text); TextHash.normalize
    // lowercases internally with the same collation mapping — reuse
    // its exact code path (it re-lowers; the duplicate lower is still
    // one pass cheaper than the Column form, and exactness wins)
    val norm = TextHash.normalize(text, useICU)
    val md = TextHash.digest()
    md.reset()
    val key = UTF8String.fromBytes(
      TextHash.hex(md.digest(norm.getBytes("UTF-8"))))
    InternalRow(quality, key)
  }
}

/** `CurateSignals(text)` → struct<quality: double, key: string>. */
case class CurateSignals(child: Expression, useICU: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("quality", DoubleType, nullable = false),
    StructField("key", StringType, nullable = false)))
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CurateNative.signals($c, $useICU)")
  override def nullSafeEval(v: Any): Any =
    CurateNative.signals(v.asInstanceOf[UTF8String], useICU)
  override protected def withNewChildInternal(c: Expression)
      : CurateSignals = copy(child = c)
}

object CurateSignals {
  def apply(text: Column): Column = ColumnGlue.column(
    CurateSignals(ColumnGlue.expression(text), TextHash.resolveUseICU()))
}
