package graft.core

import graft.SparkSpec
import graft.core.Finalize.Container
import org.apache.spark.sql.functions._

class CoreSpec extends SparkSpec {
  import spark.implicits._

  // ---- jflatten rules (builtin_test.cljc:18-42) ----
  test("jflatten: empty seq is no-match, singleton unwraps, multi stays") {
    assert(Finalize.jflatten(Container(Nil)).isEmpty)
    assert(Finalize.jflatten(Container(Seq(5))).contains(5))
    assert(Finalize.jflatten(Container(Seq(1, 2))).contains(Seq(1, 2)))
  }
  test("jflatten: nested containers splice; explicit arrays survive") {
    assert(Finalize.jflatten(
      Container(Seq(Container(Seq(1, 2)), 3))).contains(Seq(1, 2, 3)))
    // explicit JSON array keeps its arity even as a singleton
    assert(Finalize.jflatten(Seq(5)).contains(Seq(5)))
    assert(Finalize.jflatten(Container(Seq(Seq(5)))).contains(Seq(5)))
  }
  test("jflatten: no-match entries drop out of objects") {
    assert(Finalize.jflatten(Map("a" -> 1, "b" -> Container(Nil)))
      .contains(Map("a" -> 1)))
  }

  // ---- path steps (quirk battery, builtin_test.cljc:318-456) ----
  private def nested = spark.read.json(Seq(
    """{"orders": [
         {"id": 1, "items": [{"sku": "a", "qty": 2}, {"sku": "b", "qty": 1}]},
         {"id": 2, "items": [{"sku": "c", "qty": 5}]}
       ]}""").toDS())

  test("get-step maps over arrays; flatten splices one level") {
    val ids = nested.select(Paths.getStep($"orders", "id").as("ids"))
      .as[Seq[Long]].head()
    assert(ids == Seq(1L, 2L))
    val allItems = nested.select(
      Paths.getStepFlatten($"orders", "items").as("x"))
      .select(size($"x")).head().getInt(0)
    assert(allItems == 3)
  }

  test("non-compositional a[i]: index applies per parent, not merged") {
    // orders.items[0] → first item of EACH order (2 results)
    val perParent = nested.select(
      Paths.indexPerParent(
        Paths.getStep($"orders", "items"), 0).as("x"))
      .select(transform($"x", _.getField("sku")).as("skus"))
      .as[Seq[String]].head()
    assert(perParent == Seq("a", "c"))
    // vs indexing the merged sequence → single item
    val merged = nested.select(
      Paths.index(Paths.getStepFlatten($"orders", "items"), 0)
        .getField("sku").as("s")).as[String].head()
    assert(merged == "a")
  }

  test("filter/map/value steps and range") {
    val qtys = nested.select(
      Paths.mapStep(
        Paths.filterStep(
          Paths.getStepFlatten($"orders", "items"),
          i => i.getField("qty") > 1),
        i => i.getField("qty")).as("q")).as[Seq[Long]].head()
    assert(qtys == Seq(2L, 5L))
    assert(spark.range(1).select(Paths.range(lit(3), lit(6)))
      .as[Seq[Int]].head() == Seq(3, 4, 5, 6))
  }

  test("Finalize.result applies container semantics to frames") {
    assert(Finalize.result(spark.range(0).toDF()).isEmpty)
    assert(Finalize.result(Seq(7).toDF("v")).contains(7))
    assert(Finalize.result(Seq(1, 2).toDF("v")).contains(Seq(1, 2)))
  }
}
