package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Ann, Retrieval}

class BitextSpec extends SparkSpec {
  import spark.implicits._

  // Textbook hubness fixture: hub target t0 = h direction is the raw-
  // cosine top-1 of EVERY source (cos ≈ 0.89 vs 0.84 for the aligned
  // target), but its backward average is equally high, so the margin
  // criterion demotes it and recovers the true alignment s_i -> t_i.
  private val h = Array(0.5, 0.5, 0.5, 0.5)
  private def e(i: Int) = Array.tabulate(4)(j => if (j == i) 1.0 else 0.0)
  private def s(i: Int) =
    Array.tabulate(4)(j => 0.4667 * e(i)(j) + 0.5667 * h(j))

  private val srcs = (0 until 4).map(i => (i.toLong, s(i)))
  private val tgts = (100L, h) +: (0 until 4).map(i => (101L + i, e(i)))

  test("raw cosine sends every source to the hub") {
    val top1 = Ann.bruteForceTopK(srcs.toDF("vec_id", "embedding"),
        tgts.toDF("vec_id", "embedding"),
        "vec_id", "vec_id", "embedding", k = 1)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toMap
    assert(top1.values.forall(_ == 100L), top1.toString)
  }

  test("margin mining demotes the hub and recovers the alignment") {
    val mined = Retrieval.marginMine(srcs.toDF("vec_id", "embedding"),
        tgts.toDF("vec_id", "embedding"),
        "vec_id", "vec_id", "embedding", k = 2)
      .select("src_id", "tgt_id").as[(Long, Long)].collect().toMap
    (0 until 4).foreach { i =>
      assert(mined(i.toLong) == 101L + i, mined.toString)
    }
  }

  test("approx (1-bit shortlist) form agrees with exact mining on real data") {
    val emb = Tables.embeddings(spark, sf())
    val src = emb.filter(col("vec_id") % 2 === 0)
    val tgt = emb.filter(col("vec_id") % 2 === 1)
    import org.apache.spark.sql.DataFrame
    def pairsOf(df: DataFrame) = df.select("src_id", "tgt_id")
      .as[(Long, Long)].collect().toMap
    val exact = pairsOf(Retrieval.marginMine(src, tgt,
      "vec_id", "vec_id", "embedding", k = 4))
    val approx = pairsOf(Retrieval.marginMineApprox(src, tgt,
      "vec_id", "vec_id", "embedding", k = 4, shortlist = 50))
    assert(approx.keySet == exact.keySet)
    val agree = exact.count { case (s0, t0) => approx(s0) == t0 }
    // 50-of-250 hamming shortlists: the disagreement budget is
    // shortlist recall AND the backward average seeing only
    // shortlisted cosines — require strong but not total agreement
    assert(agree >= (exact.size * 8) / 10, s"$agree/${exact.size}")
    // the decisive pin: with the shortlist covering the whole corpus
    // the two forms share every number — equality must be EXACT
    val full = pairsOf(Retrieval.marginMineApprox(src, tgt,
      "vec_id", "vec_id", "embedding", k = 4, shortlist = 250))
    assert(full == exact)
  }

  test("overlapping id spaces: approx == exact, colliding-id pairs survive") {
    // src and tgt BOTH 0-based — the cross-corpus shape where a true
    // pair's ids coincide. Aligned target for source i carries id i
    // (hub gets id 4), so every winning pair (i, i) is exactly the
    // pair a self-search exclusion would silently drop from the
    // shortlist. Full-corpus shortlist → the two forms share every
    // number; equality must be EXACT.
    // 16-wide (binEncode requires size == dim), zero-padded: the
    // padding changes no cosine
    def pad(v: Array[Double]) = v ++ Array.fill(12)(0.0)
    val src = (0 until 4).map(i => (i.toLong, pad(s(i))))
      .toDF("vec_id", "embedding")
    val tgt = ((4L, pad(h)) +:
        (0 until 4).map(i => (i.toLong, pad(e(i)))))
      .toDF("vec_id", "embedding")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("src_id", "tgt_id").as[(Long, Long)].collect().toMap
    val exact = pairs(Retrieval.marginMine(src, tgt,
      "vec_id", "vec_id", "embedding", k = 2))
    val approx = pairs(Retrieval.marginMineApprox(src, tgt,
      "vec_id", "vec_id", "embedding", k = 2, shortlist = 5, dim = 16))
    assert(exact == (0 until 4).map(i => i.toLong -> i.toLong).toMap,
      s"exact mining must recover the colliding-id alignment: $exact")
    assert(approx == exact,
      "approx must score id-colliding pairs exactly like the exact form")
  }

  test("margins are finite and the best margin exceeds 1 for aligned pairs") {
    val m = Retrieval.marginMine(srcs.toDF("vec_id", "embedding"),
        tgts.toDF("vec_id", "embedding"),
        "vec_id", "vec_id", "embedding", k = 2)
      .select("margin").as[Double].collect()
    assert(m.forall(v => !v.isNaN && !v.isInfinite && v > 1.0))
  }
}
