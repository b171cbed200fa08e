package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftglue.ColumnGlue

/** Cosine similarity between two `array<double>` columns as ONE
  * codegen'd primitive pass — bit-identical to the Column-HOF form
  * `dot/(√Σa²·√Σb²)` with left-fold accumulation in element order
  * (`Dedup.cosine`, which every oracle mirrors), but ~10× faster:
  * zip_with/aggregate lambdas fall out of whole-stage codegen into
  * interpreted per-element eval, and cosine sits on the hot path of
  * every ANN rerank, the brute-force recall oracle, and hard-negative
  * mining. Mismatched lengths or null elements yield NULL, exactly
  * like the HOF form (zip_with pads with null, which poisons the
  * fold).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val res = ctx.freshName("cosRes")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
        |Double $res = graft.functions.CosineSim.compute($a, $b);
        |if ($res == null) { ${ev.isNull} = true; }
        |else { ${ev.value} = $res.doubleValue(); }
        |""".stripMargin
    })
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = CosineSim.compute(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])
    if (r == null) null else r.doubleValue()
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): CosineSim = copy(left = l, right = r)
}

object CosineSim {
  def apply(a: Column, b: Column): Column =
    ColumnGlue.column(CosineSim(
      ColumnGlue.expression(a.cast("array<double>")),
      ColumnGlue.expression(b.cast("array<double>"))))

  /** Returns null on length mismatch or null elements (the HOF
    * semantics); boxed so codegen can branch on it.
    */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0d
    var sa = 0.0d
    var sb = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      sa += x * x
      sb += y * y
      i += 1
    }
    java.lang.Double.valueOf(
      dot / (java.lang.Math.sqrt(sa) * java.lang.Math.sqrt(sb)))
  }
}
