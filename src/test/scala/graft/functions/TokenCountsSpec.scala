package graft.functions

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.pipeline.Dedup

/** TokenCounts (native per-row token frequency) must agree with the
  * Column-form tokens it summarizes — over the real documents table
  * plus unicode/whitespace edge shapes.
  */
class TokenCountsSpec extends SparkSpec {

  private def edgeDf = {
    import spark.implicits._
    Seq(
      (-1L, ""),
      (-2L, "   "),
      (-3L, "a A a! a? b"),
      (-4L, "ONE one oNe two"),
      (-5L, "unicode Ünïcødé straße ÇA 日本語 🙂 2x2"),
      (-6L, "repeat repeat repeat")).toDF("rid", "text")
  }

  test("exploded counts == groupBy of the Column-form token explode") {
    val doc = Tables.documents(spark, sf("sf0.01"))
      .select(col("doc_id").as("rid"), col("text"))
      .union(edgeDf)
    val native = doc.select(col("rid"),
        explode(TokenCounts(col("text"))).as("tc"))
      .select(col("rid"), col("tc.token").as("token"),
        col("tc.cnt").as("cnt"))
    val columnForm = doc.select(col("rid"),
        explode(Dedup.tokens(col("text"))).as("token"))
      .groupBy("rid", "token").agg(count(lit(1)).as("cnt"))
    assert(native.exceptAll(columnForm).count() == 0)
    assert(columnForm.exceptAll(native).count() == 0)
  }

  test("sum of counts equals the token count; order is first-occurrence") {
    import spark.implicits._
    val df = Seq("b a b c a b").toDF("text")
    val row = df.select(TokenCounts(col("text")).as("tc")).head()
    val tc = row.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1)))
    assert(tc == Seq(("b", 3L), ("a", 2L), ("c", 1L)))
  }

  test("zero-token text yields an empty array; null stays null") {
    import spark.implicits._
    val df = Seq(Some("?!,."), Some(""), Option.empty[String])
      .toDF("text")
    val rows = df.select(TokenCounts(col("text")).as("tc")).collect()
    assert(rows(0).getSeq[Any](0).isEmpty)
    assert(rows(1).getSeq[Any](0).isEmpty)
    assert(rows(2).isNullAt(0))
  }
}
