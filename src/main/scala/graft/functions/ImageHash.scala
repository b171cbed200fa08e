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

  /** REAL decode (round 17): the same 72-cell luma grid from an
    * actual JPEG/PNG/GIF/BMP payload via the JDK's pure-JVM ImageIO —
    * no native codec needed, so this runs in any executor JVM. Each
    * grid cell area-averages its pixel block's Rec.601 luma
    * (299R+587G+114B, integer math). Returns null for undecodable
    * bytes (no registered reader / truncated file) — the caller's
    * null, not an exception, so one corrupt payload in a 100 TB
    * corpus drops that row instead of failing the stage.
    */
  private def lumaGridImageIO(data: Array[Byte]): Array[Long] = {
    val img =
      try javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(data))
      catch { case _: java.io.IOException => null }
    if (img == null || img.getWidth == 0 || img.getHeight == 0)
      return null
    val w = img.getWidth
    val h = img.getHeight
    val luma = new Array[Long](Rows * Cols)
    var r = 0
    while (r < Rows) {
      var c = 0
      while (c < Cols) {
        // block bounds cover the image exactly; images narrower than
        // the grid share pixels across cells (x1 forced past x0)
        val x0 = math.min(c * w / Cols, w - 1)
        val x1 = math.max((c + 1) * w / Cols, x0 + 1)
        val y0 = math.min(r * h / Rows, h - 1)
        val y1 = math.max((r + 1) * h / Rows, y0 + 1)
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            sum += 299L * ((rgb >> 16) & 0xff) +
              587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        luma(r * Cols + c) = sum / ((x1 - x0).toLong * (y1 - y0))
        c += 1
      }
      r += 1
    }
    luma
  }

  /** [[dHashWords]] with the REAL ImageIO decoder in place of the
    * stub grid — identical comparison packing and word layout, so
    * every downstream consumer (Hamming kernels, pigeonhole block
    * joins, persisted media indexes) works on real image bytes
    * unchanged. Null for undecodable payloads.
    */
  def dHashWordsImageIO(data: Array[Byte]): ArrayData = {
    val luma = lumaGridImageIO(data)
    if (luma == null) return null
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

/** `DHashWordsImageIO(data)` → array<int> of 4 16-bit words from a
  * REAL JPEG/PNG decode (JDK ImageIO — pure JVM, executor-safe). NULL
  * payload → NULL; UNDECODABLE payload → NULL too (the result is
  * nullable beyond the input's nullability), so corrupt rows drop out
  * of signature frames instead of failing the stage. The oracle gates
  * keep the deterministic stub kernel ([[DHashWords]]) — a SQL engine
  * can't replay a codec — and ImageHashSpec pins this path on
  * in-test-encoded fixtures.
  */
case class DHashWordsImageIO(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, false)
  override def nullable: Boolean = true
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} =
        graft.functions.ImageHashNative.dHashWordsImageIO($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  override def nullSafeEval(v: Any): Any =
    ImageHashNative.dHashWordsImageIO(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression)
      : DHashWordsImageIO = copy(child = c)
}

object DHashWordsImageIO {
  def apply(data: Column): Column =
    ColumnGlue.column(DHashWordsImageIO(ColumnGlue.expression(data)))
}
