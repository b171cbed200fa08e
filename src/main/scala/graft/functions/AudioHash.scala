package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftglue.ColumnGlue

/** Acoustic fingerprint over an opaque binary media payload — the
  * audio-level near-dup key of a multimodal training pipeline, in the
  * shape of Haitsma–Kalker's robust-hash recipe (ISMIR'02): frame the
  * signal into consecutive windows, compute per-frame energies, emit
  * one bit per consecutive-frame energy comparison; re-encoded or
  * slightly-clipped copies of a recording flip few bits, so Hamming
  * distance is the dedup metric — exactly [[ImageHashNative]]'s role
  * for images, with time frames where dHash has grid cells.
  *
  * The DECODE step is the container's stub seam (see
  * [[graft.pipeline.Multimodal]]): no audio codec exists here, so
  * "decode to PCM" is a deterministic byte-derived stand-in — sample
  * i is an integer LCG mix of the payload's i-th codepoint. A
  * production build replaces ONLY `pcm` with a real decoder emitting
  * one int per sample; the consecutive framing (65 equal windows →
  * 64 energy deltas), the energy sums, and the 4×16-bit word packing
  * ([[graft.pipeline.Ann.binEncode]]'s layout, so the Hamming /
  * word-blocking / persisted-bit-index machinery is shared) are the
  * real, scale-tested parts. Integer arithmetic only — exact in any
  * SQL engine, so the gate oracle replays it end to end.
  */
object AudioHashNative {

  private final val Frames = 65 // 65 windows → 64 consecutive deltas

  /** STUB decode: one deterministic sample per payload codepoint. */
  private def pcm(data: Array[Byte]): Array[Long] = {
    val cps = new String(data,
      java.nio.charset.StandardCharsets.UTF_8).codePoints.toArray
    val s = new Array[Long](cps.length)
    var i = 0
    while (i < cps.length) {
      s(i) = (cps(i).toLong * 1103515245L + i.toLong * 12345L) % 2048L
      i += 1
    }
    s
  }

  /** 64-bit fingerprint packed as 4×16-bit words (array<int>):
    * sample i of n lands in frame (i*65)/n (65 consecutive
    * roughly-equal windows), frame energy = Σ sample², bit b is set
    * iff energy(b) < energy(b+1); word w carries bits 16w..16w+15,
    * bit i at 1<<i — binEncode's exact layout. An empty payload has
    * all-zero energies → all-zero words.
    */
  def audioFpWords(data: Array[Byte]): ArrayData = {
    val s = pcm(data)
    val n = s.length
    val e = new Array[Long](Frames)
    var i = 0
    while (i < n) {
      e(((i.toLong * Frames) / n).toInt) += s(i) * s(i)
      i += 1
    }
    val words = new Array[Int](4)
    var b = 0
    while (b < 64) {
      if (e(b) < e(b + 1)) words(b / 16) |= 1 << (b % 16)
      b += 1
    }
    ArrayData.toArrayData(words)
  }
}

/** `AudioFpWords(data)` → array<int> of 4 16-bit words. NULL payload
  * → NULL (null-intolerant UnaryExpression default).
  */
case class AudioFpWords(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, false)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.AudioHashNative.audioFpWords($c)")
  override def nullSafeEval(v: Any): Any =
    AudioHashNative.audioFpWords(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): AudioFpWords =
    copy(child = c)
}

object AudioFpWords {
  def apply(data: Column): Column =
    ColumnGlue.column(AudioFpWords(ColumnGlue.expression(data)))
}
