package graft.props

import graft.SparkSpec
import graft.functions.Jsonata
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Bulk property test for JSONata array indexing (`aref`, reference
  * builtin.cljc:361-376): negative indices count from the end,
  * out-of-range gives no match. ScalaCheck generates the cases; ONE
  * DataFrame comparison evaluates them all distributed (a per-case
  * Spark action would be two orders of magnitude slower).
  */
class ArefSpec extends SparkSpec {

  private def model(arr: Seq[Long], i: Int): Option[Long] = {
    val idx = if (i < 0) arr.size + i else i
    if (idx >= 0 && idx < arr.size) Some(arr(idx)) else None
  }

  test("aref matches the JSONata index model over generated cases") {
    val gen = for {
      arr <- Gen.listOf(Gen.choose(-50L, 50L)).map(_.take(7))
      i <- Gen.choose(-9, 9)
    } yield (arr, i)
    val cases: Seq[(Seq[Long], Int)] =
      Gen.listOfN(500, gen).apply(Gen.Parameters.default, Seed(42L)).get
    import spark.implicits._
    val df = cases.toDF("arr", "i")
      .select(Jsonata.aref(col("arr"), col("i")).as("got"))
    val got = df.collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getLong(0)))
    val want = cases.map { case (a, i) => model(a, i) }
    assert(got.toSeq == want,
      cases.zip(got).zip(want).filter { case ((_, g), w) => g != w }
        .take(5).toString)
  }

  test("canonical number encoding agrees between driver and plan") {
    // Shred.canon (plan-side) and QueryCompiler pattern constants
    // (driver-side) must produce identical strings or typed EAV joins
    // silently miss — pin the integral-double collapse on both sides
    val nums: Seq[Double] = Gen.listOfN(300,
      Gen.oneOf(Gen.choose(-1e6, 1e6),
        Gen.choose(-1000, 1000).map(_.toDouble)))
      .apply(Gen.Parameters.default, Seed(7L)).get
    import spark.implicits._
    val planSide = nums.toDF("d").select(
      when(col("d") === col("d").cast("long").cast("double"),
        col("d").cast("long").cast("string"))
        .otherwise(col("d").cast("string")).as("c"))
      .collect().map(_.getString(0))
    val driverSide = nums.map(n =>
      if (n == n.longValue.toDouble) n.longValue.toString else n.toString)
    assert(planSide.toSeq == driverSide)
  }
}
