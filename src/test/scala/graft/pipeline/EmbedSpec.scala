package graft.pipeline

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class EmbedSpec extends SparkSpec {

  test("hashedDocVector matches a driver-side replica of the " +
      "md5 bucket/sign formula") {
    import spark.implicits._
    def bucketSign(tok: String, dim: Int): (Int, Long) = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val b = (java.lang.Long.parseLong(hex.substring(0, 15), 16)
        % dim).toInt
      val s = if (Character.digit(hex.charAt(15), 16) % 2 == 0) 1L
        else -1L
      (b, s)
    }
    val df = Seq((1L, "alpha alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val expected = Seq("alpha" -> 2L, "beta" -> 1L, "gamma" -> 1L,
        "delta" -> 1L)
      .map { case (t, tf) =>
        val (b, s) = bucketSign(t, 8); b -> s * tf }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      .filter(_._2 != 0L)
    val out = Embed.hashedDocVector(df, "doc_id", "text", dim = 8)
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(out == expected)
  }

  test("dense form carries the sparse components with zeros " +
      "elsewhere; zero-token docs keep a (zero) row") {
    import spark.implicits._
    val doc = Tables.documents(spark, sf()).limit(50)
      .select(col("doc_id"), col("text"))
      .union(Seq((999999L, ""), (999998L, "?!.,")).toDF("doc_id", "text"))
    val sparse = Embed.hashedDocVector(doc, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    val dense = Embed.hashedDocVectorDense(doc, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(dense.size == 52, "every document gets a dense row")
    assert(dense(999999L).forall(_ == 0L) &&
      dense(999998L).forall(_ == 0L),
      "zero-token documents embed as the zero vector, not a missing row")
    dense.foreach { case (id, vec) =>
      assert(vec.length == 64)
      vec.zipWithIndex.foreach { case (v, b) =>
        assert(v == sparse.getOrElse((id, b), 0L),
          s"doc $id bucket $b")
      }
    }
  }

  test("hashed vectors feed the embedding family end to end") {
    val doc = Tables.documents(spark, sf()).limit(100)
    val vecs = Embed.hashedDocVectorDense(doc, "doc_id", "text")
      .select(col("doc_id"), col("vec").cast("array<double>").as("v"))
    val (assigned, centers) =
      Cluster.kcenterGreedy(vecs, "doc_id", "v", k = 3)
    assert(centers.size == 3)
    assert(assigned.count() == 100)
    graft.core.Caches.releaseAll(spark)
  }
}
