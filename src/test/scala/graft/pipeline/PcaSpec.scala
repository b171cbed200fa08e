package graft.pipeline

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Pca.fit/project: recovers a planted dominant direction, is
  * invariant to partitioning (the decimal-reduction contract), and
  * the projection matches a driver-side replay of the same
  * arithmetic.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def planted(n: Int, dim: Int): Seq[(Long, Array[Float])] = {
    // deterministic pseudo-data: strong variance along `axis`, weak
    // elsewhere — the top component must align with axis
    val axis = Array.tabulate(dim)(j =>
      if (j % 7 == 0) 0.6 else 0.1)
    val nrm = math.sqrt(axis.map(a => a * a).sum)
    val u = axis.map(_ / nrm)
    (0 until n).map { i =>
      val t = ((i * 2654435761L) % 1000L) / 500.0 - 1.0 // [-1, 1)
      val vec = Array.tabulate(dim) { j =>
        val noise = (((i * 40503L + j * 69069L) % 97L) / 97.0 - 0.5) * 0.05
        (t * 3.0 * u(j) + noise).toFloat
      }
      (i.toLong, vec)
    }
  }

  test("fit recovers a planted dominant direction") {
    val dim = 64
    val df = planted(400, dim).toDF("vec_id", "embedding")
    val m = Pca.fit(df, "embedding", dim, iters = 12)
    val axis = Array.tabulate(dim)(j => if (j % 7 == 0) 0.6 else 0.1)
    val an = math.sqrt(axis.map(a => a * a).sum)
    val cos = m.comp.zip(axis).map { case (c, a) => c * a / an }.sum
    assert(math.abs(cos) > 0.99, s"cos=$cos")
    // unit component
    val n2 = m.comp.map(c => c * c).sum
    assert(math.abs(n2 - 1.0) < 1e-9, s"norm2=$n2")
  }

  test("fit + project are partitioning-invariant (decimal reductions)") {
    val df = planted(300, 64).toDF("vec_id", "embedding")
    val m1 = Pca.fit(df, "embedding", 64)
    val m2 = Pca.fit(df.repartition(13), "embedding", 64)
    assert(m1.comp.toSeq == m2.comp.toSeq)
    assert(m1.mean.toSeq == m2.mean.toSeq)
    val p1 = df.select($"vec_id", Pca.project($"embedding", m1).as("p"))
      .orderBy("vec_id").as[(Long, Double)].collect().toSeq
    val p2 = df.repartition(7)
      .select($"vec_id", Pca.project($"embedding", m2).as("p"))
      .orderBy("vec_id").as[(Long, Double)].collect().toSeq
    assert(p1 == p2)
  }

  test("null vectors are excluded; projection replays on the driver") {
    val base = planted(50, 64)
    val df = (base :+ (999L, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding")
    val m = Pca.fit(df, "embedding", 64)
    val mNoNull = Pca.fit(base.toDF("vec_id", "embedding"),
      "embedding", 64)
    assert(m.comp.toSeq == mNoNull.comp.toSeq)
    // driver replay of project's decimal chain on one row
    // valueOf = Spark's Cast rounding base (shortest decimal repr)
    def dec8(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(8, java.math.RoundingMode.HALF_UP)
    val (id0, v0) = base.head
    val want = v0.indices.map(j =>
        dec8((v0(j).toDouble - m.mean(j)) * m.comp(j)))
      .reduce(_.add(_)).doubleValue
    val got = df.filter($"vec_id" === id0)
      .select(Pca.project($"embedding", m)).as[Double].head()
    assert(got == want)
  }

  test("fitK: deflation recovers two planted directions, orthogonal") {
    val dim = 64
    // two orthogonal planted directions with distinct variances
    // (disjoint supports → exactly orthogonal): strong on j%7==0,
    // weaker on j%7==3
    val u1 = Array.tabulate(dim)(j => if (j % 7 == 0) 1.0 else 0.0)
    val u2 = Array.tabulate(dim)(j => if (j % 7 == 3) 1.0 else 0.0)
    def unit(a: Array[Double]) = {
      val n = math.sqrt(a.map(x => x * x).sum); a.map(_ / n)
    }
    val (v1, v2) = (unit(u1), unit(u2))
    val rows = (0 until 400).map { i =>
      val t1 = ((i * 2654435761L) % 1000L) / 500.0 - 1.0
      val t2 = ((i * 1103515245L) % 1000L) / 500.0 - 1.0
      (i.toLong, Array.tabulate(dim) { j =>
        val noise = (((i * 40503L + j * 69069L) % 97L) / 97.0 - 0.5) * 0.02
        (t1 * 3.0 * v1(j) + t2 * 1.5 * v2(j) + noise).toFloat
      })
    }
    val m = Pca.fitK(rows.toDF("vec_id", "embedding"), "embedding",
      dim, k = 2)
    def cos(a: Array[Double], b: Array[Double]) =
      a.zip(b).map(p => p._1 * p._2).sum
    assert(math.abs(cos(m.comps(0), v1)) > 0.99,
      s"comp0 vs planted: ${cos(m.comps(0), v1)}")
    assert(math.abs(cos(m.comps(1), v2)) > 0.99,
      s"comp1 vs planted: ${cos(m.comps(1), v2)}")
    // deflation property: well-separated components are orthogonal;
    // unit to within the dec12-rounded norm's residue
    assert(math.abs(cos(m.comps(0), m.comps(1))) < 1e-4)
    m.comps.foreach(c =>
      assert(math.abs(c.map(x => x * x).sum - 1.0) < 1e-6))
    // eigenvalues decrease with the planted variances
    assert(m.eigenvalues(0) > m.eigenvalues(1) &&
      m.eigenvalues(1) > 0, m.eigenvalues.toString)
    // fit is fitK's head component
    val single = Pca.fit(rows.toDF("vec_id", "embedding"),
      "embedding", dim)
    assert(single.comp.toSeq == m.comps.head.toSeq)
    assert(single.mean.toSeq == m.mean.toSeq)
  }

  test("projections on the fixture embeddings are finite and distinct") {
    val emb = Tables.embeddings(spark, sf())
    val m = Pca.fit(emb, "embedding", 64)
    val ps = emb.filter($"embedding".isNotNull)
      .select(Pca.project($"embedding", m)).as[Double].collect()
    assert(ps.forall(p => !p.isNaN && !p.isInfinite))
    assert(ps.distinct.length > ps.length / 2)
  }
}
