package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData,
  GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native fast path for the dominant reduce-step shape
  * `seq{key : $sum(field)}` (JSONata object grouping with an
  * aggregate body — the reference's own conformance example,
  * `parse.cljc:834-839` / `builtin_test.cljc:610-615`).
  *
  * The general compiler lowering is a cascade of higher-order
  * functions (pair elements with keys, distinct the keys, filter the
  * group per key, evaluate the body) — correct for arbitrary bodies,
  * but Catalyst evaluates every lambda INTERPRETED, ~5 passes over
  * the array per row, and it is the single hottest expression in the
  * battery's sf10 ceiling (q_reduce_step). This kernel computes the
  * same map in ONE codegen'd pass with a hash accumulator.
  *
  * Exact semantic contract with the general path (ReduceStepSpec
  * pins the equivalence):
  *  - keys in FIRST-OCCURRENCE order (array_distinct semantics);
  *  - elements with a null/absent key contribute nothing;
  *  - null field VALUES drop before the sum (the sequence path
  *    `group.field` filters non-matches), so an all-null group sums
  *    to $sum([]) = 0.0;
  *  - result values are DoubleType ($sum's type) — integral inputs
  *    stay exact below 2^53, so accumulation order is immaterial.
  */
object GroupAggNative {

  /** vt codes for the value field's primitive accessor. */
  final val VInt = 0; final val VLong = 1
  final val VDouble = 2; final val VFloat = 3

  def groupSumMap(arr: ArrayData, keyIdx: Int, valIdx: Int,
      vt: Int, nFields: Int): MapData = {
    val n = arr.numElements()
    val order = new java.util.ArrayList[UTF8String]
    val sums = new java.util.HashMap[UTF8String, java.lang.Double]
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val row = arr.getStruct(i, nFields)
        if (!row.isNullAt(keyIdx)) {
          val k = row.getUTF8String(keyIdx)
          val prev = sums.get(k)
          // values are always non-null boxed doubles, so a null get
          // IS key absence — no second containsKey probe needed
          if (prev == null) order.add(k)
          val base = if (prev == null) 0.0d else prev.doubleValue()
          val next =
            if (row.isNullAt(valIdx)) base
            else base + (vt match {
              case VInt => row.getInt(valIdx).toDouble
              case VLong => row.getLong(valIdx).toDouble
              case VDouble => row.getDouble(valIdx)
              case _ => row.getFloat(valIdx).toDouble
            })
          sums.put(k, next)
        }
      }
      i += 1
    }
    val m = order.size()
    val keys = new Array[Any](m)
    val vals = new Array[Any](m)
    var j = 0
    while (j < m) {
      val k = order.get(j)
      keys(j) = k
      vals(j) = sums.get(k).doubleValue()
      j += 1
    }
    new ArrayBasedMapData(
      new GenericArrayData(keys), new GenericArrayData(vals))
  }
}

/** `GroupSumMap(items)` → map<string, double>: group-by-key sum over
  * an array of structs; NULL array → NULL map.
  */
case class GroupSumMap(child: Expression, keyIdx: Int, valIdx: Int,
    vt: Int, nFields: Int) extends UnaryExpression {
  override def dataType: DataType =
    MapType(StringType, DoubleType, valueContainsNull = false)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GroupAggNative.groupSumMap(" +
        s"$c, $keyIdx, $valIdx, $vt, $nFields)")
  override def nullSafeEval(v: Any): Any =
    GroupAggNative.groupSumMap(v.asInstanceOf[ArrayData],
      keyIdx, valIdx, vt, nFields)
  override protected def withNewChildInternal(c: Expression): GroupSumMap =
    copy(child = c)
}
