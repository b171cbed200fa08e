package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftglue.ColumnGlue

/** Product-quantization code assignment (Jégou et al. 2011, "Product
  * Quantization for Nearest Neighbor Search"): the vector splits into
  * `m` contiguous sub-vectors of `subDim` components and each
  * sub-vector is replaced by the id of its nearest codebook entry
  * (argmin ||sub − entry||², ties to the smaller id — the same
  * Lloyd-assignment rule as [[KmeansAssign]]).
  *
  * One fused primitive loop per row produces all `m` codes — no
  * per-subspace `slice()` allocations, no interpreted HOFs. Codebooks
  * are baked into the plan at construction (flat row-major
  * `books(s*ks*subDim + c*subDim + j)`) and shipped with the
  * serialized plan; `nrms(s*ks + c)` holds |entry|² summed in index
  * order so the argmin doubles are bit-identical to the DuckDB
  * oracle's ordered list_sum replay.
  *
  * Returns `array<int>` of length `m` — the m-byte-per-vector storage
  * layout that makes 100 TB ANN feasible (a 64-double embedding
  * becomes 8 small ints; the search scan never touches the vectors).
  */
case class PqCodes(child: Expression, books: Array[Double],
    nrms: Array[Double], m: Int, ks: Int, subDim: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("pqBooks", books, "double[]")
    val nr = ctx.addReferenceObj("pqNrms", nrms, "double[]")
    nullSafeCodeGen(ctx, ev, vec => {
      s"""
        |${ev.value} = graft.functions.PqCodes.encode(
        |  $vec, $b, $nr, $m, $ks, $subDim);
        |""".stripMargin
    })
  }

  override def nullSafeEval(v: Any): Any =
    PqCodes.encode(v.asInstanceOf[ArrayData], books, nrms, m, ks,
      subDim)

  override protected def withNewChildInternal(c: Expression): PqCodes =
    copy(c)

  // array fields compare by reference in case-class equality
  override def equals(o: Any): Boolean = o match {
    case p: PqCodes =>
      p.child == child && p.m == m && p.ks == ks &&
        p.subDim == subDim &&
        java.util.Arrays.equals(p.books, books) &&
        java.util.Arrays.equals(p.nrms, nrms)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(m),
      Integer.valueOf(ks),
      Integer.valueOf(java.util.Arrays.hashCode(books)))
}

object PqCodes {
  def apply(vec: Column, books: Array[Array[Array[Double]]]): Column = {
    val m = books.length
    val ks = books.head.length
    val subDim = books.head.head.length
    val flat = new Array[Double](m * ks * subDim)
    val nrms = new Array[Double](m * ks)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < ks) {
        val w = books(s)(c)
        var n = 0.0d
        var j = 0
        while (j < subDim) {
          flat(s * ks * subDim + c * subDim + j) = w(j)
          n += w(j) * w(j)
          j += 1
        }
        nrms(s * ks + c) = n
        c += 1
      }
      s += 1
    }
    ColumnGlue.column(PqCodes(
      ColumnGlue.expression(vec.cast("array<double>")),
      flat, nrms, m, ks, subDim))
  }

  private[functions] def flatten(
      books: Array[Array[Array[Double]]]): Array[Double] = {
    val m = books.length
    val ks = books.head.length
    val subDim = books.head.head.length
    val flat = new Array[Double](m * ks * subDim)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < ks) {
        System.arraycopy(books(s)(c), 0, flat,
          s * ks * subDim + c * subDim, subDim)
        c += 1
      }
      s += 1
    }
    flat
  }

  /** Shared by interpreted eval and generated code (one static call
    * per row keeps whole-stage codegen intact). Argmin of
    * |c|² − 2·v·c per subspace; dots accumulate in index order.
    */
  def encode(vec: ArrayData, books: Array[Double],
      nrms: Array[Double], m: Int, ks: Int, subDim: Int): ArrayData = {
    val out = new Array[Any](m)
    val have = vec.numElements()
    var s = 0
    while (s < m) {
      val off = s * subDim
      var best = 0
      var bestD = 0.0d
      var c = 0
      while (c < ks) {
        var dot = 0.0d
        var j = 0
        val boff = s * ks * subDim + c * subDim
        while (j < subDim && off + j < have) {
          dot += vec.getDouble(off + j) * books(boff + j)
          j += 1
        }
        val d = nrms(s * ks + c) - 2.0d * dot
        if (c == 0 || d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }
}

/** Query-side ADC lookup table: flat `array<double>` of m×ks entries,
  * `lut[s*ks + c] = q_sub(s) · books(s)(c)` with each dot accumulated
  * in index order. One static call per query row — the Column-chain
  * form (m×ks literal multiply-add trees) overflows Janino's 64 KB
  * method limit and drops the stage out of whole-stage codegen.
  */
case class PqLut(child: Expression, books: Array[Double], m: Int,
    ks: Int, subDim: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("pqLutBooks", books, "double[]")
    nullSafeCodeGen(ctx, ev, vec => {
      s"""
        |${ev.value} = graft.functions.PqLut.compute(
        |  $vec, $b, $m, $ks, $subDim);
        |""".stripMargin
    })
  }

  override def nullSafeEval(v: Any): Any =
    PqLut.compute(v.asInstanceOf[ArrayData], books, m, ks, subDim)

  override protected def withNewChildInternal(c: Expression): PqLut =
    copy(c)

  override def equals(o: Any): Boolean = o match {
    case p: PqLut =>
      p.child == child && p.m == m && p.ks == ks &&
        p.subDim == subDim && java.util.Arrays.equals(p.books, books)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(m),
      Integer.valueOf(ks),
      Integer.valueOf(java.util.Arrays.hashCode(books)))
}

object PqLut {
  def apply(vec: Column, books: Array[Array[Array[Double]]]): Column =
    ColumnGlue.column(PqLut(
      ColumnGlue.expression(vec.cast("array<double>")),
      PqCodes.flatten(books), books.length, books.head.length,
      books.head.head.length))

  def compute(vec: ArrayData, books: Array[Double], m: Int, ks: Int,
      subDim: Int): ArrayData = {
    val out = new Array[Any](m * ks)
    val have = vec.numElements()
    var s = 0
    while (s < m) {
      val off = s * subDim
      var c = 0
      while (c < ks) {
        var dot = 0.0d
        var j = 0
        val boff = s * ks * subDim + c * subDim
        while (j < subDim && off + j < have) {
          dot += vec.getDouble(off + j) * books(boff + j)
          j += 1
        }
        out(s * ks + c) = dot
        c += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }
}

/** Reconstruction (decode) of a PQ code array back to the
  * concatenated codebook entries — spec-level (distortion
  * measurement); search never materializes it.
  */
case class PqDecode(child: Expression, books: Array[Double], m: Int,
    ks: Int, subDim: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("pqDecBooks", books, "double[]")
    nullSafeCodeGen(ctx, ev, codes => {
      s"""
        |${ev.value} = graft.functions.PqDecode.compute(
        |  $codes, $b, $m, $ks, $subDim);
        |""".stripMargin
    })
  }

  override def nullSafeEval(v: Any): Any =
    PqDecode.compute(v.asInstanceOf[ArrayData], books, m, ks, subDim)

  override protected def withNewChildInternal(c: Expression): PqDecode =
    copy(c)

  override def equals(o: Any): Boolean = o match {
    case p: PqDecode =>
      p.child == child && p.m == m && p.ks == ks &&
        p.subDim == subDim && java.util.Arrays.equals(p.books, books)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(m),
      Integer.valueOf(ks),
      Integer.valueOf(java.util.Arrays.hashCode(books)))
}

object PqDecode {
  def apply(codes: Column, books: Array[Array[Array[Double]]]): Column =
    ColumnGlue.column(PqDecode(ColumnGlue.expression(codes),
      PqCodes.flatten(books), books.length, books.head.length,
      books.head.head.length))

  def compute(codes: ArrayData, books: Array[Double], m: Int, ks: Int,
      subDim: Int): ArrayData = {
    val out = new Array[Any](m * subDim)
    val n = math.min(m, codes.numElements())
    var s = 0
    while (s < n) {
      val c = codes.getInt(s)
      val boff = s * ks * subDim + c * subDim
      var j = 0
      while (j < subDim) {
        out(s * subDim + j) = books(boff + j)
        j += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }
}
