package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftglue.ColumnGlue

/** The `top` nearest IVF centroid ids for a vector, ordered by
  * descending dot product (ties → larger id first, mirroring the
  * DuckDB oracle's ORDER BY d DESC, i DESC): one tight primitive loop
  * per row over the baked centroid matrix — replaces `k` interpreted
  * `aggregate(zip_with(...))` dot products per row (same pattern as
  * [[HyperplaneBuckets]]).
  *
  * Returns `array<int>` of length `min(top, k)`.
  */
case class CentroidRank(child: Expression, k: Int, dim: Int,
    seed: Int, top: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType)

  // centroid matrix baked at plan construction (deterministic PRNG),
  // shipped with the serialized plan
  private val cents: Array[Array[Double]] =
    graft.pipeline.Ann.centroids(k, dim, seed)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("centroids", cents, "double[][]")
    nullSafeCodeGen(ctx, ev, vec => {
      s"""
        |${ev.value} = graft.functions.CentroidRank.compute(
        |  $vec, $m, $top);
        |""".stripMargin
    })
  }

  override def nullSafeEval(v: Any): Any =
    CentroidRank.compute(v.asInstanceOf[ArrayData], cents, top)

  override protected def withNewChildInternal(c: Expression)
      : CentroidRank = copy(c)
}

object CentroidRank {
  def apply(vec: Column, k: Int, dim: Int, seed: Int,
      top: Int): Column =
    ColumnGlue.column(CentroidRank(
      ColumnGlue.expression(vec.cast("array<double>")),
      k, dim, seed, top))

  /** Shared by interpreted eval and generated code (one static call
    * per row keeps whole-stage codegen intact).
    */
  def compute(vec: ArrayData, cents: Array[Array[Double]],
      top: Int): ArrayData = {
    val k = cents.length
    val dots = new Array[Double](k)
    var c = 0
    while (c < k) {
      val w = cents(c)
      val n = math.min(vec.numElements(), w.length)
      var d = 0.0
      var j = 0
      while (j < n) { d += vec.getDouble(j) * w(j); j += 1 }
      dots(c) = d
      c += 1
    }
    val take = math.min(top, k)
    val out = new Array[Any](take)
    val used = new Array[Boolean](k)
    var t = 0
    while (t < take) {
      var best = -1
      var i = 0
      while (i < k) {
        // desc dot; exact ties prefer the larger id (>= with i asc)
        if (!used(i) && (best < 0 || dots(i) >= dots(best))) best = i
        i += 1
      }
      used(best) = true
      out(t) = best
      t += 1
    }
    new GenericArrayData(out)
  }
}
