package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftglue.ColumnGlue

/** Compile/behavior fence around the library's SOLE Spark-internal
  * coupling: `org.apache.spark.sql.graftglue.ColumnGlue` reaches the
  * `private[sql]` `classic.ExpressionUtils` /
  * `ColumnNodeToExpressionConverter` to bridge custom Catalyst
  * expressions into user-facing Columns (Spark 4 removed the public
  * `new Column(expr)` bridge). Everything else in graft is public
  * API.
  *
  * On a Spark version bump this file is the canary: if the internals
  * move, EITHER ColumnGlue stops compiling (the loud case) OR its
  * behavior drifts — these tests pin the behavior so the quiet case
  * is loud too. If this suite fails after a Spark upgrade, fix
  * ColumnGlue (one file, three one-line methods) and nothing else.
  */
class ColumnGlueFenceSpec extends SparkSpec {

  test("Column↔Expression round-trip survives the private[sql] seam") {
    import spark.implicits._
    val c = ColumnGlue.column(
      ColumnGlue.expression(lit(2) + lit(3)))
    val got = Seq(1).toDF("x").select(c.as("v")).head.getInt(0)
    assert(got == 5,
      "ColumnGlue.column/expression no longer round-trips — the " +
        "private[sql] ExpressionUtils seam moved; update ColumnGlue")
  }

  test("resolvedExpression converts eagerly for FunctionRegistry use") {
    val e = ColumnGlue.resolvedExpression(upper(lit("ok")))
    // an eager conversion yields a catalyst tree NOW (possibly
    // unresolved functions, never a lazy ColumnNodeExpression shell)
    assert(!e.getClass.getName.contains("ColumnNodeExpression"),
      "resolvedExpression returned the lazy wrapper — registered " +
        "graft_* SQL functions would reach codegen unresolved; " +
        "update ColumnGlue.resolvedExpression")
  }

  test("a custom graft expression flows through the seam end-to-end") {
    import spark.implicits._
    val col0 = ColumnGlue.column(
      graft.functions.TokenCounts(
        ColumnGlue.expression(lit("a b a"))))
    val n = Seq(1).toDF("x").select(size(col0).as("n")).head.getInt(0)
    assert(n == 2,
      "custom Catalyst expressions no longer reach Columns through " +
        "ColumnGlue — the sole Spark-internal touchpoint broke")
  }
}
