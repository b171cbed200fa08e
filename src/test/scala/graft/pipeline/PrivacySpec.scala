package graft.pipeline

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkSpec {

  private def quasi = Seq(col("c_mktsegment"), col("c_nationkey"))

  test("summary agrees with the class report") {
    val cust = Tables.customer(spark, sf())
    val classes = Privacy.kAnonymityClasses(cust, quasi, 8).collect()
    val s = Privacy.kAnonymitySummary(cust, quasi, 8).head
    assert(s.getLong(0) == classes.length)
    assert(s.getLong(1) == classes.count(!_.getBoolean(3)))
    assert(s.getLong(2) == classes.filter(!_.getBoolean(3))
      .map(_.getLong(2)).sum)
    assert(s.getLong(3) == classes.map(_.getLong(2)).min)
  }

  test("suppression yields a k-anonymous frame with exactly the ok " +
      "classes' rows") {
    // single-column quasi so both verdicts occur at sf0.001
    // (segment sizes there: 23,23,30,34,40 — k=30 keeps three)
    val quasi = Seq(col("c_mktsegment"))
    val cust = Tables.customer(spark, sf())
    val k = 30L
    val kept = Privacy.suppressSmallClasses(cust, quasi, k)
    // released frame is k-anonymous by construction
    val minClass = Privacy.kAnonymitySummary(kept, quasi, k)
      .head.getLong(3)
    assert(minClass >= k)
    // row count = sum of ok class sizes (nothing else dropped)
    val okRows = Privacy.kAnonymityClasses(cust, quasi, k)
      .filter(col("ok")).agg(sum("class_size")).head.getLong(0)
    assert(kept.count() == okRows)
    assert(kept.columns.toSeq == cust.columns.toSeq,
      "helper column must not leak")
  }

  test("l-diversity: distinct and recursive verdicts on known classes") {
    import spark.implicits._
    // class A: counts 5,1,1 — 3 distinct but dominated by one value
    // class B: counts 2,2,2 — balanced
    // class C: one value only
    val rows =
      Seq.fill(5)(("A", "x")) ++ Seq(("A", "y"), ("A", "z")) ++
      Seq(("B", "x"), ("B", "x"), ("B", "y"), ("B", "y"),
        ("B", "z"), ("B", "z")) ++
      Seq.fill(4)(("C", "x"))
    val df = rows.toDF("q", "s")
    val out = Privacy.lDiversityClasses(df, Seq(col("q")), col("s"),
        l = 2, c = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("A")
    assert(a.getLong(1) == 7 && a.getLong(2) == 3)   // size, distinct
    assert(a.getLong(3) == 5 && a.getLong(4) == 2)   // r1, tail(l=2)
    assert(a.getBoolean(5) && !a.getBoolean(6))      // distinct ok, rec fails
    val b = out("B")
    assert(b.getLong(3) == 2 && b.getLong(4) == 4)
    assert(b.getBoolean(5) && b.getBoolean(6))
    val cC = out("C")
    assert(cC.getLong(2) == 1 && cC.getLong(4) == 0)
    assert(!cC.getBoolean(5) && !cC.getBoolean(6))
  }

  test("l-diversity: tail is the full class when l = 1") {
    import spark.implicits._
    val df = Seq(("A", "x"), ("A", "x"), ("A", "y")).toDF("q", "s")
    val r = Privacy.lDiversityClasses(df, Seq(col("q")), col("s"),
      l = 1, c = 1).head
    assert(r.getLong(4) == 3)          // tail includes r1
    assert(r.getBoolean(5))            // any non-empty class has ≥1
    assert(r.getBoolean(6))            // 2 < 1·3
  }

  test("NULL quasi values form their own (joinable) class") {
    import spark.implicits._
    val df = Seq((1, Some("a")), (2, Some("a")), (3, None),
      (4, None), (5, None)).toDF("id", "q")
    val classes = Privacy.kAnonymityClasses(df, Seq(col("q")), 3)
      .collect().map(r => (Option(r.getString(0)), r.getLong(1),
        r.getBoolean(2))).toSet
    assert(classes == Set((Some("a"), 2L, false), (None, 3L, true)))
  }
}
