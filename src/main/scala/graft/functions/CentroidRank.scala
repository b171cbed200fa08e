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

/** Lloyd-assignment argmin for [[graft.pipeline.Cluster.kmeans]]:
  * cluster id minimizing |c|² − 2·v·c, ties to the SMALLER id — one
  * codegen'd loop per row over arbitrary (iteration-updated) centroid
  * literals. A Column-expression fold over k `when(d < best.d, ...)`
  * branches duplicates the whole dot-product tree per level (2^k
  * blowup — measured 94 s at sf0.1 for k=8); this is the same
  * arithmetic in one call. The |c|² terms are computed driver-side in
  * index order (`nrms`), matching the oracle's ordered list_sum.
  */
case class KmeansAssign(child: Expression, cents: Array[Double],
    nrms: Array[Double], dim: Int) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("kmeansCents", cents, "double[]")
    val nr = ctx.addReferenceObj("kmeansNrms", nrms, "double[]")
    defineCodeGen(ctx, ev, vec =>
      s"graft.functions.CentroidRank.assignNearest($vec, $m, $nr, $dim)")
  }

  override def nullSafeEval(v: Any): Any =
    CentroidRank.assignNearest(v.asInstanceOf[ArrayData], cents, nrms,
      dim)

  override protected def withNewChildInternal(c: Expression)
      : KmeansAssign = copy(c)

  // array fields compare by reference in case-class equality
  override def equals(o: Any): Boolean = o match {
    case m: KmeansAssign =>
      m.child == child && m.dim == dim &&
        java.util.Arrays.equals(m.cents, cents) &&
        java.util.Arrays.equals(m.nrms, nrms)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(dim),
      Integer.valueOf(java.util.Arrays.hashCode(cents)))
}

object KmeansAssign {
  def apply(vec: Column, cents: Array[Array[Double]],
      nrms: Array[Double]): Column =
    ColumnGlue.column(KmeansAssign(ColumnGlue.expression(vec),
      cents.flatten, nrms, cents.head.length))
}

/** All `k` centroid dot products in id order (`array<double>`): the
  * query-side bias table of residual IVF-PQ — under the inner-product
  * metric, <q, x> decomposes as <q, centroid> + <q, residual>, so a
  * probe needs this per-list bias next to its shared residual LUT.
  * Same baked centroid matrix as [[CentroidRank]].
  */
case class CentroidDots(child: Expression, k: Int, dim: Int,
    seed: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType)

  private val cents: Array[Array[Double]] =
    graft.pipeline.Ann.centroids(k, dim, seed)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("centroidsD", cents, "double[][]")
    nullSafeCodeGen(ctx, ev, vec => {
      s"""
        |${ev.value} = graft.functions.CentroidRank.dots($vec, $m);
        |""".stripMargin
    })
  }

  override def nullSafeEval(v: Any): Any =
    CentroidRank.dots(v.asInstanceOf[ArrayData], cents)

  override protected def withNewChildInternal(c: Expression)
      : CentroidDots = copy(c)
}

object CentroidDots {
  def apply(vec: Column, k: Int, dim: Int, seed: Int): Column =
    ColumnGlue.column(CentroidDots(
      ColumnGlue.expression(vec.cast("array<double>")), k, dim, seed))
}

object CentroidRank {
  def apply(vec: Column, k: Int, dim: Int, seed: Int,
      top: Int): Column =
    ColumnGlue.column(CentroidRank(
      ColumnGlue.expression(vec.cast("array<double>")),
      k, dim, seed, top))

  /** Dot products against every centroid, accumulated in index order
    * (the oracle's list_sum fold).
    */
  def dots(vec: ArrayData, cents: Array[Array[Double]]): ArrayData = {
    val k = cents.length
    val out = new Array[Any](k)
    var c = 0
    while (c < k) {
      val w = cents(c)
      val n = math.min(vec.numElements(), w.length)
      var d = 0.0
      var j = 0
      while (j < n) { d += vec.getDouble(j) * w(j); j += 1 }
      out(c) = d
      c += 1
    }
    new GenericArrayData(out)
  }

  /** Argmin of |c|² − 2·v·c over flat row-major centroids; ties keep
    * the smaller id (strict less-than). Dot products accumulate in
    * index order — the fold order the DuckDB oracle's list_sum
    * replays, so the doubles (and therefore the argmin on near-ties)
    * are bit-identical.
    */
  def assignNearest(vec: ArrayData, cents: Array[Double],
      nrms: Array[Double], dim: Int): Int = {
    val k = nrms.length
    val n = math.min(dim, vec.numElements())
    var best = 0
    var bestD = 0.0d
    var c = 0
    while (c < k) {
      var dot = 0.0d
      var j = 0
      val off = c * dim
      while (j < n) { dot += vec.getDouble(j) * cents(off + j); j += 1 }
      val d = nrms(c) - 2.0d * dot
      if (c == 0 || d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

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
