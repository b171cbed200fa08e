package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftglue.ColumnGlue

/** Per-frame perceptual fingerprints over an opaque video payload —
  * the video-level near-dup key of a multimodal training pipeline
  * (content-ID style: sample frames, dHash each frame, match videos
  * by shared frame hashes; robust to trims/concatenations because
  * frames match individually, not the whole stream).
  *
  * The DECODE step is the container's stub seam (see
  * [[graft.pipeline.Multimodal]]): no video codec exists here, so
  * "decode frame f" is a deterministic codepoint-block stand-in —
  * frame f is the payload's codepoint range [f·frameLen, (f+1)·frameLen)
  * and its 9×8 luma grid accumulates the same positional contributions
  * as [[ImageHashNative]] with indexes relative to the frame start. A
  * production build replaces ONLY `frameLuma` with a real
  * decoder+downsampler producing 72 ints per sampled frame; the dHash
  * packing, the (hi, lo) 2×32-bit join-key fold (chosen over one
  * 64-bit value because bit 63 would wrap a signed BIGINT — DuckDB
  * errors where Spark wraps), and the pair topology are the real,
  * scale-tested parts. Integer arithmetic only: any engine replays
  * every bit.
  */
object VideoHashNative {

  private final val Cols = 9
  private final val Rows = 8

  /** Per-frame dHash fold: one pass over the payload codepoints,
    * emitting struct<f:int, hi:long, lo:long> per frame —
    * hi = w3·2^16 + w2, lo = w1·2^16 + w0 of the frame's 64-bit dHash
    * in [[ImageHashNative]]'s word layout. The trailing partial frame
    * hashes like any other (a real sampler emits whatever the last
    * GOP holds). Empty payload → empty array.
    */
  def frameHashes(data: Array[Byte], frameLen: Int): ArrayData = {
    val cps = new String(data,
      java.nio.charset.StandardCharsets.UTF_8).codePoints.toArray
    val nFrames = (cps.length + frameLen - 1) / frameLen
    val out = new Array[Any](nFrames)
    var f = 0
    while (f < nFrames) {
      val start = f * frameLen
      val end = math.min(start + frameLen, cps.length)
      val luma = new Array[Long](Rows * Cols)
      var i = start
      while (i < end) {
        val j = i - start
        luma(j % (Rows * Cols)) +=
          (cps(i).toLong * 2654435761L + j.toLong * 40503L) % 1000L
        i += 1
      }
      val words = new Array[Long](4)
      var b = 0
      while (b < 64) {
        val r = b / (Cols - 1)
        val c = b % (Cols - 1)
        if (luma(r * Cols + c) < luma(r * Cols + c + 1))
          words(b / 16) |= 1L << (b % 16)
        b += 1
      }
      out(f) = InternalRow(f, (words(3) << 16) | words(2),
        (words(1) << 16) | words(0))
      f += 1
    }
    new GenericArrayData(out)
  }
}

/** `VideoFpHashes(data, frameLen)` → array<struct<f:int, hi:long,
  * lo:long>>: one perceptual frame fingerprint per codepoint block.
  * NULL payload → NULL; `frameLen` must be a positive literal (it is
  * part of the fingerprint definition, like a hash seed).
  */
case class VideoFpHashes(child: Expression, frameLen: Int)
    extends UnaryExpression {
  require(frameLen >= 1, s"frameLen must be positive, got $frameLen")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("f", IntegerType, false),
    StructField("hi", LongType, false),
    StructField("lo", LongType, false))), false)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VideoHashNative.frameHashes($c, $frameLen)")
  override def nullSafeEval(v: Any): Any =
    VideoHashNative.frameHashes(v.asInstanceOf[Array[Byte]], frameLen)
  override protected def withNewChildInternal(c: Expression): VideoFpHashes =
    copy(child = c)
}

object VideoFpHashes {
  def apply(data: Column, frameLen: Int): Column =
    ColumnGlue.column(VideoFpHashes(ColumnGlue.expression(data), frameLen))
}
