package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Minimum recall@k floors for every approximate ANN family, scored
  * by [[Retrieval.rankMetrics]] against the brute-force exact list on
  * a planted-cluster corpus. The oracle gates pin each family's
  * EXACT output (bit-stable); these floors pin its QUALITY — a
  * parameter or kernel change that silently collapses recall (e.g. a
  * degenerate bucketing that still "runs") fails here even if it
  * stays deterministic. Floors sit ~0.1 below the measured values on
  * this fixture so ordinary tie-break jitter passes and structural
  * collapse does not.
  */
class RecallFloorSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 64
  private val Clusters = 8
  private val PerCluster = 30
  private val K = 10

  // deterministic pseudo-noise in [-1, 1): splitmix-ish integer mix,
  // no Random (partitioning- and run-independent)
  private def mix(x: Long): Double = {
    var z = x * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    ((z ^ (z >>> 31)).toDouble / Long.MaxValue)
  }

  // well-separated unit-scale centers + small within-cluster spread:
  // a query's exact top-k is dominated by its own cluster, so recall
  // measures whether the approximate family FINDS that cluster
  private def corpus: DataFrame = {
    val rows = for {
      c <- 0 until Clusters
      i <- 0 until PerCluster
    } yield {
      val id = (c * PerCluster + i).toLong
      val v = Array.tabulate(Dim) { j =>
        mix(c.toLong * 64 + j) + 0.15 * mix(id * 1000 + j)
      }
      (id, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  private def queries(cor: DataFrame): DataFrame =
    cor.filter(col("vec_id") % PerCluster < 2) // 2 probes per cluster

  private def avgRecall(approx: DataFrame, exact: DataFrame): Double =
    Retrieval.rankMetrics(
        approx.select(col("query_id"), col("rank"),
          col("neighbor_id").as("doc_id")),
        exact.select(col("query_id"), col("rank"),
          col("neighbor_id").as("doc_id")), K)
      .agg(avg("recall")).head.getDouble(0)

  test("recall@10 floors: lsh / ivf / pq-refined / ivf-pq-residual / binary") {
    val cor = graft.core.Caches.stage(corpus)
    val qs = queries(cor)
    val exact = graft.core.Caches.stage(
      Ann.bruteForceTopK(qs, cor, "vec_id", "vec_id", "embedding", K))

    val measured = Seq(
      "lsh" -> avgRecall(Ann.lshTopK(qs, cor, "vec_id", "vec_id",
        "embedding", K, planes = 10, tables = 4, dim = Dim), exact),
      "ivf" -> avgRecall(Ann.ivfTopK(qs, cor, "vec_id", "vec_id",
        "embedding", K, nCentroids = 16, nprobe = 4, dim = Dim), exact),
      "pq_refined" -> avgRecall(Ann.pqTopKRefined(qs, cor, "vec_id",
        "vec_id", "embedding", K, shortlist = 50, dim = Dim), exact),
      "ivfpq_residual" -> avgRecall(Ann.ivfPqResidualTopK(qs, cor,
        "vec_id", "vec_id", "embedding", K,
        books = Ann.pqTrainResidual(cor, "embedding", m = 8, ks = 16,
          iters = 3, dim = Dim),
        nCentroids = 16, nprobe = 4, dim = Dim, seed = 4242), exact),
      "binary" -> avgRecall(Ann.binaryTopK(qs, cor, "vec_id",
        "vec_id", "embedding", K, shortlist = 50, dim = Dim), exact))

    // measured on this fixture: lsh 0.93, ivf 0.99, pq_refined 1.00,
    // binary 1.00, ivfpq_residual 0.31. The first four end in an
    // exact-cosine re-rank of a shortlist, so their recall is
    // shortlist recall (high here); ivfPqResidualTopK by design
    // scores CODES ONLY (<q,centroid> + residual ADC — the layout
    // that never touches a vector at query time), so quantization
    // error itself costs recall@10 — still ~7× the random baseline
    // (10/239 ≈ 0.04). Its floor pins that tier; callers needing
    // re-rank recall compose it with a vector fetch like
    // pqTopKRefined does.
    val floors = Map(
      "lsh" -> 0.60, "ivf" -> 0.55, "pq_refined" -> 0.80,
      "ivfpq_residual" -> 0.20, "binary" -> 0.80)
    val report = measured.map { case (f, r) => f"$f=$r%.3f" }
      .mkString(", ")
    measured.foreach { case (family, r) =>
      assert(r >= floors(family),
        s"$family recall@$K $r below floor ${floors(family)} ($report)")
    }
    info(s"measured recall@$K: $report")
  }
}
