package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftglue.ColumnGlue

/** Scalar (8-bit) quantization of an embedding vector — the FAISS-SQ8
  * storage layout: per-vector affine codes
  * `c_i = floor((v_i − lo) · 255 / (hi − lo) + 0.5)` with `lo/hi` the
  * vector's min/max, so 64 doubles become 64 bytes + two doubles
  * (~7.5× less scan I/O; the coarser sibling of [[PqCodes]], kept
  * when per-component fidelity matters more than PQ's ratio).
  * Deterministic IEEE arithmetic in a fixed order — the DuckDB oracle
  * replays it with one list_transform.
  *
  * Returns `struct<lo: double, hi: double, codes: array<int>>`; a
  * constant vector (hi == lo) encodes as all-zero codes.
  */
case class SqEncode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("lo", DoubleType, nullable = false),
    StructField("hi", DoubleType, nullable = false),
    StructField("codes", ArrayType(IntegerType, containsNull = false),
      nullable = false)))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, vec => {
      s"""
        |${ev.value} = graft.functions.SqEncode.encode($vec);
        |""".stripMargin
    })

  override def nullSafeEval(v: Any): Any =
    SqEncode.encode(v.asInstanceOf[ArrayData])

  override protected def withNewChildInternal(c: Expression): SqEncode =
    copy(c)
}

object SqEncode {
  def apply(vec: Column): Column =
    ColumnGlue.column(SqEncode(
      ColumnGlue.expression(vec.cast("array<double>"))))

  def encode(vec: ArrayData): InternalRow = {
    val n = vec.numElements()
    var lo = Double.PositiveInfinity
    var hi = Double.NegativeInfinity
    var i = 0
    while (i < n) {
      val v = vec.getDouble(i)
      if (v < lo) lo = v
      if (v > hi) hi = v
      i += 1
    }
    if (n == 0) { lo = 0.0d; hi = 0.0d }
    val span = hi - lo
    val codes = new Array[Any](n)
    i = 0
    while (i < n) {
      codes(i) =
        if (span == 0.0d) 0
        else math.floor((vec.getDouble(i) - lo) * 255.0d / span
          + 0.5d).toInt
      i += 1
    }
    InternalRow(lo, hi, new GenericArrayData(codes))
  }
}

/** Inverse of [[SqEncode]]: `lo + c_i · (hi − lo) / 255` — the
  * dequantized approximation (within half a quantization step per
  * component).
  */
case class SqDecode(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, st => {
      s"""
        |${ev.value} = graft.functions.SqDecode.decode($st);
        |""".stripMargin
    })

  override def nullSafeEval(v: Any): Any =
    SqDecode.decode(v.asInstanceOf[InternalRow])

  override protected def withNewChildInternal(c: Expression): SqDecode =
    copy(c)
}

object SqDecode {
  def apply(sq: Column): Column =
    ColumnGlue.column(SqDecode(ColumnGlue.expression(sq)))

  def decode(sq: InternalRow): ArrayData = {
    val lo = sq.getDouble(0)
    val hi = sq.getDouble(1)
    val codes = sq.getArray(2)
    val span = hi - lo
    val n = codes.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = lo + codes.getInt(i) * span / 255.0d
      i += 1
    }
    new GenericArrayData(out)
  }
}
