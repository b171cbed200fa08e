package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftglue.ColumnGlue

/** One-pass vector moment sums for [[graft.pipeline.Pca]]: count,
  * per-component sums, and the upper-triangle second-moment sums of a
  * `dim`-vector column, accumulated as EXACT 1e-6 fixed-point longs
  * (addend = floor(x·1e6 + 0.5), a pure-IEEE rounding both engines
  * replay verbatim; long addition is order-free, so partial/final
  * merge order cannot perturb the result).
  *
  * WHY a TypedImperativeAggregate and not 2 144 sum() columns: a
  * dim=64 moment matrix as separate aggregate expressions generates a
  * plan with 2 144 AggregateFunctions — analysis plus codegen of that
  * plan cost ~30 s at sf0.1 and flooded the JIT code cache hard
  * enough to slow NEIGHBORING queries (round-10 bench). This single
  * function holds the whole state in one fixed 17 KB long array —
  * bounded buffer by construction (the r9 express-aggregate
  * objection does not apply: the buffer never grows with data), with
  * ordinary partial/final map-side combine.
  *
  * Overflow posture: addExact — a corpus big enough to overflow a
  * per-moment long sum (≈ 9·10¹⁸ / addend) fails loudly rather than
  * silently wrapping; shard-and-merge the fit at that scale.
  */
case class VecMomentSums(child: Expression, dim: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  private def nStats = 1 + dim + dim * (dim + 1) / 2

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](nStats)

  @inline private def fx(x: Double): Long =
    Math.floor(x * 1e6 + 0.5).toLong

  override def update(buf: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() != dim)
        throw new IllegalArgumentException(
          s"VecMomentSums expects $dim components, " +
            s"got ${arr.numElements()}")
      val d = new Array[Double](dim)
      var j = 0
      while (j < dim) { d(j) = arr.getDouble(j); j += 1 }
      buf(0) += 1
      j = 0
      while (j < dim) {
        buf(1 + j) = Math.addExact(buf(1 + j), fx(d(j))); j += 1
      }
      var p = 1 + dim
      j = 0
      while (j < dim) {
        var k = j
        while (k < dim) {
          buf(p) = Math.addExact(buf(p), fx(d(j) * d(k)))
          p += 1; k += 1
        }
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) = Math.addExact(a(i), b(i)); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): VecMomentSums =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecMomentSums =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): VecMomentSums =
    copy(child = c)
}

object VecMomentSums {
  def apply(vec: Column, dim: Int): Column =
    ColumnGlue.column(
      VecMomentSums(ColumnGlue.expression(vec), dim)
        .toAggregateExpression())
}
