package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftglue.ColumnGlue

/** Bloom bitset builder for [[graft.pipeline.SeenSet]]: ORs together
  * the bit positions of every input row into a FIXED `mBits`-bit
  * bitset held as `mBits/64` longs. The input column is the
  * already-computed `array<long>` of bit positions (the md5-derived
  * double-hash family lives in SeenSet as plain built-in column
  * arithmetic, so the hot path stays whole-stage-codegen'd and the
  * same expressions serve build and probe — they can never disagree).
  *
  * WHY a TypedImperativeAggregate: the merged state is a bitwise OR,
  * which no built-in aggregate expresses over a fixed array; the
  * buffer is bounded by construction (mBits/8 bytes, independent of
  * data volume — the [[VecMomentSums]] posture), with ordinary
  * partial/final map-side combine, and OR is commutative/associative
  * so merge order cannot perturb the result.
  *
  * Position contract: every element must lie in [0, mBits) — enforced
  * loudly rather than masked, because an out-of-range position means
  * build and probe were given different `mBits` and the filter's
  * no-false-negative guarantee is already gone.
  */
case class BloomBits(child: Expression, mBits: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(mBits > 0 && mBits % 64 == 0,
    s"mBits must be a positive multiple of 64, got $mBits")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](mBits / 64)

  override def update(buf: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val p = arr.getLong(i)
          if (p < 0 || p >= mBits)
            throw new IllegalArgumentException(
              s"BloomBits position $p outside [0, $mBits) — build and " +
                "probe must use the same mBits")
          buf((p >>> 6).toInt) |= 1L << (p & 63)
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
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
  override def withNewMutableAggBufferOffset(o: Int): BloomBits =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomBits =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BloomBits =
    copy(child = c)
}

object BloomBits {
  def apply(positions: Column, mBits: Int): Column =
    ColumnGlue.column(
      BloomBits(ColumnGlue.expression(positions), mBits)
        .toAggregateExpression())
}
