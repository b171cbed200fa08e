package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftglue.ColumnGlue

/** Perceptual image hash (dHash, difference hash) over an opaque
  * binary media payload — the image-level near-dup key of a
  * multimodal training pipeline (Krawetz's dHash: resize to a 9×8
  * luma grid, emit one bit per horizontal neighbor comparison; near
  * identical images differ in a few bits, so Hamming distance is the
  * dedup metric).
  *
  * The DECODE step is the container's stub seam (see
  * [[graft.pipeline.Multimodal]]): no image codec exists here, so
  * "decode to a 9-wide × 8-high luma grid" is a deterministic
  * byte-derived stand-in — cell g accumulates the same positional
  * codepoint contributions as `Multimodal.stubDecodeBatch` with
  * dim = 72. A production build replaces ONLY `lumaGrid` with a real
  * decoder+downsampler producing the same 72 ints; the comparison
  * packing, the word layout (dim/16 16-bit words, identical to
  * [[graft.pipeline.Ann.binEncode]] so the Hamming/blocking machinery
  * is shared), and the pair-generation topology are the real,
  * scale-tested parts. The stub is oracle-replayable: integer
  * arithmetic only, exact in any SQL engine.
  */
object ImageHashNative {

  private final val Cols = 9   // grid width  (9 columns → 8 diffs/row)
  private final val Rows = 8   // grid height

  /** STUB decode: 72 luma cells from payload codepoint stripes. */
  private def lumaGrid(data: Array[Byte]): Array[Long] = {
    val cps = new String(data,
      java.nio.charset.StandardCharsets.UTF_8).codePoints.toArray
    val luma = new Array[Long](Rows * Cols)
    var i = 0
    while (i < cps.length) {
      luma(i % (Rows * Cols)) +=
        (cps(i).toLong * 2654435761L + i.toLong * 40503L) % 1000L
      i += 1
    }
    luma
  }

  /** 64-bit dHash packed as 4×16-bit words (array<int>): bit
    * b = r*8+c is set iff luma(r, c) < luma(r, c+1); word w carries
    * bits 16w..16w+15, bit i at 1<<i — binEncode's exact layout.
    */
  def dHashWords(data: Array[Byte]): ArrayData = {
    val luma = lumaGrid(data)
    val words = new Array[Int](4)
    var b = 0
    while (b < 64) {
      val r = b / (Cols - 1)
      val c = b % (Cols - 1)
      if (luma(r * Cols + c) < luma(r * Cols + c + 1))
        words(b / 16) |= 1 << (b % 16)
      b += 1
    }
    ArrayData.toArrayData(words)
  }
}

/** `DHashWords(data)` → array<int> of 4 16-bit words. NULL payload →
  * NULL (null-intolerant UnaryExpression default).
  */
case class DHashWords(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, false)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ImageHashNative.dHashWords($c)")
  override def nullSafeEval(v: Any): Any =
    ImageHashNative.dHashWords(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): DHashWords =
    copy(child = c)
}

object DHashWords {
  def apply(data: Column): Column =
    ColumnGlue.column(DHashWords(ColumnGlue.expression(data)))
}
