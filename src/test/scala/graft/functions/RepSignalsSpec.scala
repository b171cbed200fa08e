package graft.functions

import graft.SparkSpec
import graft.pipeline.TextFns
import org.apache.spark.sql.functions._

/** Pins native RepSignals ≡ the Column-composed
  * dupGramFrac/topTokenFrac pair — the native form exists for speed
  * (one codegen'd pass vs interpreted lambdas), and this equivalence
  * makes that a pure optimization.
  */
class RepSignalsSpec extends SparkSpec {
  import spark.implicits._

  private def edgeDocs = Seq(
    (1L, ""), (2L, "one"), (3L, "one two"),
    (4L, "spam spam spam spam spam spam"),
    (5L, "x y z x y z x y z q"),
    (6L, "Mixed CASE tokens mixed case TOKENS"),
    (7L, "päß ünïcode päß ünïcode päß"),
    (8L, ("a b c d " * 80).trim)).toDF("doc_id", "text")

  private def viaColumns(df: org.apache.spark.sql.DataFrame, n: Int) =
    df.select(col("doc_id"),
      TextFns.dupGramFrac(col("text"), n).as("d"),
      TextFns.topTokenFrac(col("text")).as("t"))

  private def viaNative(df: org.apache.spark.sql.DataFrame, n: Int) =
    df.select(col("doc_id"), RepSignals(col("text"), n).as("rs"))
      .select(col("doc_id"), col("rs.dup_frac").as("d"),
        col("rs.top_frac").as("t"))

  test("native == Column forms on edge-case documents") {
    for (n <- Seq(2, 3, 5)) {
      val a = viaColumns(edgeDocs, n).collect().toSeq
      val b = viaNative(edgeDocs, n).collect().toSeq
      assert(a == b, s"n=$n:\ncolumns=$a\nnative =$b")
    }
  }

  test("native == Column forms on the documents table") {
    val doc = graft.Tables.documents(spark, sf())
    val a = viaColumns(doc, 3).orderBy("doc_id").collect().toSeq
    val b = viaNative(doc, 3).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("null text stays null") {
    val df = Seq((1L, Option.empty[String]), (2L, Some("a b a b")))
      .toDF("doc_id", "text")
    val got = df.select(RepSignals(col("text"), 2).isNull.as("n"))
      .as[Boolean].collect().toSeq
    assert(got == Seq(true, false))
  }
}
