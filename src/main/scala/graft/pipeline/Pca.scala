package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Principal-component extraction over an embedding column — the
  * whitening / decorrelation / compression step of an embedding
  * pipeline (PCA-reduced vectors feed the same ANN family at a
  * fraction of the scan width; the top component is also the
  * standard "dominant direction" diagnostic for embedding drift).
  *
  * Shape (100 TB): ONE corpus scan computes the mean vector and the
  * upper-triangle second-moment matrix inside a single
  * [[graft.functions.VecMomentSums]] aggregate — a fixed 17 KB
  * long-array buffer per partition, ordinary partial/final combine,
  * so no shuffle carries anything but the per-partition states (and
  * no plan carries 2 144 aggregate expressions — see the kernel's
  * docstring for the measured codegen cost of the wide-agg form).
  * The power iteration then runs on the DRIVER over the
  * dim×dim matrix (microseconds; k-means precedent: model math on
  * collected dim-bounded state, model baked into the plan as
  * literals), and projection is a scan-local centered dot product.
  *
  * Engine portability (the reason for the arithmetic choices): every
  * cross-row reduction goes through per-addend DECIMAL rounding
  * ([[graft.Tables.dec]] contract) so summation order cannot perturb
  * the result; every scalar step between reductions is plain IEEE
  * double arithmetic in a FIXED evaluation order. The DuckDB oracle
  * replays the moments, the covariance assembly, all `iters` power
  * steps (a recursive CTE over a DOUBLE[] state), and the projection
  * — bit-for-bit, the same discipline as p_kmeans/p_pagerank.
  */
object Pca {

  /** Trained model: mean vector + unit top component (both length
    * `dim`), plus the moment scale used (the oracle needs it).
    */
  final case class PcaModel(mean: Array[Double], comp: Array[Double])

  // valueOf (shortest-decimal base), NOT new BigDecimal(x) (exact
  // binary expansion): Spark's double→DECIMAL Cast rounds the
  // shortest decimal representation, and the two bases break HALF_UP
  // ties differently (2.675 is 2.67499…82 in binary) — the driver
  // must round on the same base as the engine it bakes literals into.
  private def dec12(x: Double): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(x).setScale(12,
      java.math.RoundingMode.HALF_UP)

  /** Fit mean + top principal component: one wide-agg corpus scan
    * (null vectors excluded), then `iters` fixed-point power steps on
    * the driver from the constant start vector (1/8, …, 1/8). The
    * iteration count is part of the model definition (no convergence
    * test — a data-dependent stopping rule would make the result
    * non-replayable), and the fixed all-positive start plus fixed
    * count also pins the component's sign.
    */
  def fit(df: DataFrame, vecCol: String, dim: Int = 64,
      iters: Int = 12): PcaModel = {
    val m = fitK(df, vecCol, dim, 1, iters)
    PcaModel(m.mean, m.comps.head)
  }

  /** Top-`k` components: mean + `comps` (each unit length, in
    * decreasing-eigenvalue order) + the Rayleigh-quotient
    * `eigenvalues` the deflation used. The practical whitening /
    * compression form — project onto the k components and feed the
    * reduced vectors to the ANN family at k/dim of the scan width.
    */
  final case class PcaKModel(mean: Array[Double],
      comps: Seq[Array[Double]], eigenvalues: Seq[Double])

  /** Fit mean + top-`k` principal components: one moment scan, then
    * per component `iters` driver power steps followed by Hotelling
    * DEFLATION (C ← C − λ v vᵀ, λ = vᵀCv) so the next iteration
    * converges to the next component. Every reduction is
    * decimal-pinned and every scalar step IEEE in fixed order, so
    * the whole k-component chain replays in the oracle — the same
    * contract as the single-component [[fit]].
    */
  def fitK(df: DataFrame, vecCol: String, dim: Int = 64, k: Int = 2,
      iters: Int = 12): PcaKModel = {
    require(k >= 1 && k <= dim, s"need 1 <= k <= $dim components")
    // all 1 + dim + dim(dim+1)/2 moment sums in ONE aggregate with a
    // fixed long-array buffer (see VecMomentSums for why not 2 144
    // sum() columns) — exact 1e-6 fixed-point, order-free
    val fxArr = df.filter(col(vecCol).isNotNull)
      .agg(graft.functions.VecMomentSums(
        col(vecCol).cast("array<double>"), dim).as("m"))
      .head().getSeq[Long](0)
    val n = fxArr(0).toDouble
    require(n > 0, "pca needs at least one non-null vector")
    // fixed-point → double exactly as the oracle does:
    // CAST(sum AS DOUBLE) / 1e6, then the same expression order
    // m/n - (s_j/n)*(s_k/n)
    def s(j: Int) = fxArr(1 + j).toDouble / 1e6
    def m(j: Int, kk: Int) = {
      val (a, b) = if (j <= kk) (j, kk) else (kk, j)
      val p = 1 + dim + (a * (2 * dim - a + 1)) / 2 + (b - a)
      fxArr(p).toDouble / 1e6
    }
    val mu = Array.tabulate(dim)(j => s(j) / n)
    var cov = Array.tabulate(dim, dim) { (j, kk) =>
      m(j, kk) / n - mu(j) * mu(kk)
    }
    // matvec through exact decimal accumulation of 12-dp-rounded
    // addends (order-independent), back to double per component
    def matvec(c: Array[Array[Double]],
        v: Array[Double]): Array[Double] =
      Array.tabulate(dim) { i =>
        var acc = java.math.BigDecimal.ZERO
        var j = 0
        while (j < dim) { acc = acc.add(dec12(c(i)(j) * v(j))); j += 1 }
        acc.doubleValue
      }
    val comps = Vector.newBuilder[Array[Double]]
    val eigs = Vector.newBuilder[Double]
    for (_ <- 1 to k) {
      var vec = Array.fill(dim)(0.125)
      for (_ <- 1 to iters) {
        val t = matvec(cov, vec)
        var n2 = java.math.BigDecimal.ZERO
        var i = 0
        while (i < dim) { n2 = n2.add(dec12(t(i) * t(i))); i += 1 }
        val nrm = math.sqrt(n2.doubleValue)
        require(nrm > 0, "degenerate covariance: zero power-step norm")
        vec = t.map(_ / nrm)
      }
      // Rayleigh quotient λ = vᵀ(Cv) with the same decimal discipline
      val t = matvec(cov, vec)
      var lacc = java.math.BigDecimal.ZERO
      var i = 0
      while (i < dim) { lacc = lacc.add(dec12(vec(i) * t(i))); i += 1 }
      val lam = lacc.doubleValue
      comps += vec
      eigs += lam
      // Hotelling deflation, entry order fixed: C - lam*v_i*v_j
      val v = vec
      cov = Array.tabulate(dim, dim) { (i2, j2) =>
        cov(i2)(j2) - lam * v(i2) * v(j2)
      }
    }
    PcaKModel(mu, comps.result(), eigs.result())
  }

  /** Scan-local projection of a vector onto the model's component
    * (centered dot product), accumulated as EXACT 1e-8 fixed-point:
    * each addend rounds to DECIMAL(18,8) (the dec contract), shifts
    * to an integral LONG, and the 64-term sum runs in long arithmetic
    * — reduction-order-free and oracle-replayable. (A chained DECIMAL
    * `+` would NOT be: Spark's decimal Add grows precision per link,
    * caps at 38, and then reduces SCALE to fit — a 64-link chain
    * silently degrades to scale 6. Aggregate sum() keeps its scale;
    * column-level chains do not. Long addends sidestep the rule.)
    */
  def project(vec: Column, model: PcaModel): Column =
    projectOn(vec, model.mean, model.comp)

  /** [[project]] onto component `c` (0-based) of a k-model. */
  def project(vec: Column, model: PcaKModel, c: Int): Column =
    projectOn(vec, model.mean, model.comps(c))

  private def projectOn(vec: Column, mean: Array[Double],
      comp: Array[Double]): Column = {
    val v = vec.cast("array<double>")
    val shift = 100000000L // 1e8 = decimal scale 8
    mean.indices.map { j =>
      (graft.Tables.dec(
        (element_at(v, j + 1) - lit(mean(j))) *
          lit(comp(j)), 8) * lit(shift)).cast("long")
    }.reduce(_ + _).cast("double") / lit(shift.toDouble)
  }
}
