package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimplifyElementAtArraySpec extends SparkSpec {
  import spark.implicits._

  private def optimized(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.optimizedPlan.toString

  test("literal in-range element_at over array() collapses to one branch") {
    val df = Seq((1, 2, 3)).toDF("a", "b", "c")
      .select(element_at(array($"a" * 10, $"b" * 10, $"c" * 10), 2)
        .as("x"))
    val plan = optimized(df)
    assert(!plan.contains("element_at"), plan)
    // only the selected branch's column survives pruning
    assert(!plan.toLowerCase.contains("create" + "array"), plan)
    assert(df.head().getInt(0) == 20)
  }

  test("negative literal index picks from the end") {
    val df = Seq((1, 2, 3)).toDF("a", "b", "c")
      .select(element_at(array($"a", $"b", $"c"), -1).as("x"))
    assert(!optimized(df).contains("element_at"))
    assert(df.head().getInt(0) == 3)
  }

  test("out-of-range and non-literal indexes are left alone") {
    val oob = Seq((1, 2)).toDF("a", "b")
      .select(try_element_at(array($"a", $"b"), lit(5)).as("x"))
    assert(oob.head().isNullAt(0)) // runtime semantics preserved
    // non-LocalRelation source so constant folding can't collapse it
    val dyn = spark.range(1, 2)
      .select(element_at(array($"id", $"id" + 1),
        ($"id").cast("int")).as("x"))
    assert(optimized(dyn).contains("element_at"))
    assert(dyn.head().getLong(0) == 1L)
  }
}
