package graft.operators

import graft.SparkSpec
import java.sql.Date

class Scd2Spec extends SparkSpec {

  private def hist(rows: Seq[(Int, String, String, Int)]) = {
    import spark.implicits._
    val df = rows.toDF("k", "attr", "d", "tie")
      .selectExpr("k", "attr", "CAST(d AS DATE) AS d", "tie")
    Scd2.history(df, "k", "attr", "d", "tie")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2),
        r.getDate(3), Option(r.getDate(4)), r.getLong(5),
        r.getBoolean(6)))
      .sortBy(r => (r._1, r._2))
  }

  test("runs collapse; intervals close on the next change") {
    val out = hist(Seq(
      (1, "A", "2024-01-01", 1), (1, "A", "2024-01-05", 2),
      (1, "B", "2024-02-01", 3), (1, "A", "2024-03-01", 4)))
    assert(out.map(r => (r._2, r._3, r._4.toString,
      r._5.map(_.toString), r._6, r._7)).toSeq == Seq(
      (1L, "A", "2024-01-01", Some("2024-02-01"), 2L, false),
      (2L, "B", "2024-02-01", Some("2024-03-01"), 1L, false),
      (3L, "A", "2024-03-01", None, 1L, true)))
  }

  test("NULL attribute is a value: NULL run opens and closes like " +
      "any other, NULL→NULL is not a change") {
    val out = hist(Seq(
      (1, null, "2024-01-01", 1), (1, null, "2024-01-02", 2),
      (1, "X", "2024-01-03", 3)))
    assert(out.length == 2)
    assert(out(0)._3 == null && out(0)._6 == 2L && !out(0)._7)
    assert(out(1)._3 == "X" && out(1)._7)
  }

  test("equal-timestamp ties resolve by the tie column") {
    val out = hist(Seq(
      (1, "B", "2024-01-01", 2), (1, "A", "2024-01-01", 1)))
    // tie=1 (A) precedes tie=2 (B): two versions, A then B
    assert(out.map(_._3).toSeq == Seq("A", "B"))
    assert(out(0)._5.isDefined && out(1)._5.isEmpty)
  }

  test("keys are independent; single observation is current") {
    val out = hist(Seq(
      (1, "A", "2024-01-01", 1), (2, "Z", "2024-06-01", 2)))
    assert(out.map(r => (r._1, r._2, r._7)).toSeq ==
      Seq((1, 1L, true), (2, 1L, true)))
  }
}
