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

  test("projections on the fixture embeddings are finite and distinct") {
    val emb = Tables.embeddings(spark, sf())
    val m = Pca.fit(emb, "embedding", 64)
    val ps = emb.filter($"embedding".isNotNull)
      .select(Pca.project($"embedding", m)).as[Double].collect()
    assert(ps.forall(p => !p.isNaN && !p.isInfinite))
    assert(ps.distinct.length > ps.length / 2)
  }
}
