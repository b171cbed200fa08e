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

  test("bigram counts == adjacent pairs of the Column-form tokens") {
    val doc = Tables.documents(spark, sf("sf0.01"))
      .select(col("doc_id").as("rid"), col("text"))
      .union(edgeDf)
    val native = doc.select(col("rid"),
        explode(BigramCounts(col("text"))).as("tc"))
      .select(col("rid"), col("tc.token").as("bg"),
        col("tc.cnt").as("cnt"))
    // column-form reference: zip the token array with its own tail
    val toks = Dedup.tokens(col("text"))
    val columnForm = doc.select(col("rid"), explode(zip_with(
        slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
        slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b))).as("bg"))
      .groupBy("rid", "bg").agg(count(lit(1)).as("cnt"))
    assert(native.exceptAll(columnForm).count() == 0)
    assert(columnForm.exceptAll(native).count() == 0)
  }

  test("bigrams: single-token and empty texts yield empty; null null") {
    import spark.implicits._
    val df = Seq(Some("solo"), Some(""), Some("a b a b"),
      Option.empty[String]).toDF("text")
    val rows = df.select(BigramCounts(col("text")).as("bc")).collect()
    assert(rows(0).getSeq[Any](0).isEmpty)
    assert(rows(1).getSeq[Any](0).isEmpty)
    val abab = rows(2).getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1)))
    assert(abab == Seq(("a b", 2L), ("b a", 1L)))
    assert(rows(3).isNullAt(0))
  }

  test("collocations: planted bigram outranks independent pairs") {
    import spark.implicits._
    // "new york" always adjacent; "the" pairs with everything
    val docs = (1 to 30).map(i =>
      (i.toLong, s"the city of new york is the city number $i and " +
        "the people of new york like the city"))
      .toDF("doc_id", "text")
    val top = graft.pipeline.TextFns.collocations(docs, "text",
        minCount = 5, k = 10)
      .collect().map(_.getString(0))
    assert(top.contains("new york"))
    val nyRank = top.indexOf("new york")
    val theCity = top.indexOf("the city")
    assert(theCity == -1 || nyRank < theCity,
      "PMI must rank the exclusive pair above the promiscuous one")
    graft.core.Caches.releaseAll(spark)
  }
}
