package graft.query

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass native form of [[TypedEnc]]'s binding encode:
  * `(v: string, vt: string) → struct<t: byte, l: long, s: string,
  * x: string>` (all fields non-null; see TypedEnc for the layout and
  * the bijection argument).
  *
  * Exists for two plan-level reasons, not just per-row cost:
  *
  *  - the Column-expression form repeats the `try_cast(v as long)` +
  *    round-trip subtree ~6× across its when-chains (no cross-operator
  *    CSE), and the canonical-long check here is one allocation-free
  *    byte scan;
  *  - the when-chains are statically NULLABLE, so
  *    InferFiltersFromConstraints derived a redundant monster
  *    IsNotNull filter over the encode expressions on every join key —
  *    this expression is `nullable = false` (outputs are total), so no
  *    filter is inferred and the join-key columns are provably
  *    non-null.
  *
  * The four projected fields share ONE evaluation: GetStructField over
  * an opaque expression is not split by SimplifyExtractValueOps, and
  * whole-stage codegen's subexpression elimination evaluates the
  * shared call once per row.
  *
  * Semantics are pinned bit-for-bit against the canonical-string
  * authority by EavTypedProps (which drives runBoxed through this
  * expression).
  */
case class TypedEncode(v: Expression, vt: Expression)
    extends BinaryExpression {

  override def left: Expression = v
  override def right: Expression = vt
  override def nullable: Boolean = false
  override def dataType: DataType = TypedEncode.schema

  override def eval(input: InternalRow): Any =
    TypedEncode.encode(
      v.eval(input).asInstanceOf[UTF8String],
      vt.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val vG = v.genCode(ctx)
    val vtG = vt.genCode(ctx)
    val vIn = if (v.nullable) s"(${vG.isNull} ? null : ${vG.value})"
      else s"${vG.value}"
    val vtIn = if (vt.nullable) s"(${vtG.isNull} ? null : ${vtG.value})"
      else s"${vtG.value}"
    ev.copy(
      code = code"""
        ${vG.code}
        ${vtG.code}
        InternalRow ${ev.value} =
          graft.query.TypedEncode.encode($vIn, $vtIn);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): TypedEncode = copy(v = l, vt = r)
}

object TypedEncode {

  val schema: StructType = StructType(Seq(
    StructField("t", ByteType, nullable = false),
    StructField("l", LongType, nullable = false),
    StructField("s", StringType, nullable = false),
    StructField("x", StringType, nullable = false)))

  def apply(v: Column, vt: Column): Column =
    ColumnGlue.column(
      TypedEncode(ColumnGlue.expression(v), ColumnGlue.expression(vt)))

  private val STR = UTF8String.fromString("str")
  private val NUM = UTF8String.fromString("num")
  private val BOOL = UTF8String.fromString("bool")
  private val REF = UTF8String.fromString("ref")
  private val TRUE = UTF8String.fromString("true")
  private val FALSE = UTF8String.fromString("false")
  private val EMPTY = UTF8String.EMPTY_UTF8

  /** `v` exactly equals `Long.toString(l)` for some l? Returns the
    * boxed l, else null — the allocation-free twin of the Column
    * form's `try_cast(v as long)` + print-back round-trip ("05",
    * " 5", "+5", "5.0", "-0", overflow → null).
    */
  private def canonicalLong(v: UTF8String): java.lang.Long = {
    val n = v.numBytes
    if (n == 0) return null
    val neg = v.getByte(0) == '-'
    val start = if (neg) 1 else 0
    val digits = n - start
    if (digits == 0 || digits > 19) return null
    val first = v.getByte(start)
    if (first == '0' && digits > 1) return null
    // accumulate NEGATIVE (covers Long.MinValue) with the
    // Long.parseLong overflow checks
    val multmin = Long.MinValue / 10
    var acc = 0L
    var i = start
    while (i < n) {
      val b = v.getByte(i)
      if (b < '0' || b > '9') return null
      val d = b - '0'
      if (acc < multmin) return null
      acc *= 10
      if (acc < Long.MinValue + d) return null
      acc -= d
      i += 1
    }
    if (neg) {
      if (acc == 0) return null // "-0" is not canonical
      java.lang.Long.valueOf(acc)
    } else {
      if (acc == Long.MinValue) return null // "9223372036854775808"
      java.lang.Long.valueOf(-acc)
    }
  }

  /** The total encode. MUST stay value-identical to TypedEnc's
    * Column-form spec (EavTypedProps pins it end-to-end). */
  def encode(v: UTF8String, vt: UTF8String): InternalRow = {
    val tag: Int =
      if (vt == null) 8
      else if (vt.equals(STR)) 0
      else if (vt.equals(NUM)) 2
      else if (vt.equals(BOOL)) 4
      else if (vt.equals(REF)) 6
      else 8
    var l: java.lang.Long = null
    if (v != null) {
      if (tag == 4) {
        if (v.equals(TRUE)) l = java.lang.Long.valueOf(1L)
        else if (v.equals(FALSE)) l = java.lang.Long.valueOf(0L)
      } else if (tag != 8) l = canonicalLong(v)
    }
    val lAct = l != null
    var t = tag
    if (lAct) t += 1
    if (v == null) t += 16
    if (vt == null) t += 32
    val s = if (lAct || v == null) EMPTY else v
    val x = if (tag == 8 && vt != null) vt else EMPTY
    new GenericInternalRow(Array[Any](t.toByte,
      if (lAct) l.longValue() else 0L, s, x))
  }
}
