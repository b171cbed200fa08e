package graft.lang

import graft.SparkSpec

/** `src{k : v}` / `src.{k : v}` reduce (grouping) step — reference
  * grammar parse.cljc:834-839; semantics per the JSONata grouping the
  * reference targets in its (NYI-disabled) conformance case
  * builtin_test.cljc:610-615: group by key expr, value expr runs once
  * per group with `$` bound to the group sequence.
  */
class ReduceStepSpec extends SparkSpec {

  private def run(src: String, expected: Any): Unit = {
    val got = RM.eval(src, spark)
    assert(got.contains(expected),
      s"""RM "$src" => $got, expected Some($expected)""")
  }

  private val orders =
    """$o := [{'cat': 'hat',  'price': 10, 'qty': 2},
      |       {'cat': 'coat', 'price': 50, 'qty': 1},
      |       {'cat': 'hat',  'price': 5,  'qty': 4}];""".stripMargin

  test("group-by with aggregate value") {
    run(s"($orders $$o{cat : $$sum(price)})",
      Map("hat" -> 15L, "coat" -> 50L))
  }

  test("dotted form `.{...}` is the same step") {
    run(s"($orders $$o.{cat : $$sum(price)})",
      Map("hat" -> 15L, "coat" -> 50L))
  }

  test("native $sum fast path == general lowering, incl. null keys/values") {
    // nulls both ways: a null KEY drops the element entirely, a null
    // VALUE drops from the sum (field paths skip non-matches), an
    // all-null group sums to $sum([]) = 0
    val data =
      """$o := [{'cat': 'hat',  'price': 10},
        |       {'cat': 'coat', 'price': null},
        |       {'cat': null,   'price': 99},
        |       {'cat': 'hat',  'price': 5},
        |       {'cat': 'coat', 'price': null}];""".stripMargin
    val expected = Map("hat" -> 15L, "coat" -> 0L)
    // bare-Ident body compiles to the codegen'd GroupSumMap kernel;
    // the parenthesized key is semantically identical but falls back
    // to the general HOF lowering — the two must agree exactly
    run(s"($data $$o{cat : $$sum(price)})", expected)
    run(s"($data $$o{(cat) : $$sum(price)})", expected)
    // and the fast path must actually be the fast path
    import org.apache.spark.sql.functions.{col, collect_list, struct, lit}
    import spark.implicits._
    val base = Seq((1L, "a", 2L), (1L, "b", 3L), (1L, "a", 5L))
      .toDF("id", "k", "v")
      .groupBy("id")
      .agg(collect_list(struct(col("k").as("flag"),
        col("v").as("qty"))).as("items"))
    val fast = RM.evalCol("items{flag : $sum(qty)}", base,
      keep = Seq("id"))
    assert(fast.queryExecution.analyzed.toString.toLowerCase
      .contains("groupsummap"),
      "bare-Ident aggregate grouping must compile to the native kernel")
    val m = fast.head.getMap[String, Double](1)
    assert(m == Map("a" -> 7.0, "b" -> 3.0))
  }

  test("value expr maps over the group sequence, singletons collapse") {
    run(s"($orders $$o{cat : $$.(price * qty)})",
      Map("hat" -> Seq(20L, 20L), "coat" -> 50L))
  }

  test("reference NYI golden: try.json grouping (builtin_test:610-615)") {
    // the reference's own (disabled) conformance case, with the
    // relevant slice of data/testing/jsonata/try.json inlined
    run(
      """( $ADDR := {'Account': {'Order': [
        |    {'Product': [
        |      {'Product Name': 'Bowler Hat', 'Price': 34.45, 'Quantity': 2},
        |      {'Product Name': 'Trilby hat', 'Price': 21.67, 'Quantity': 1}]},
        |    {'Product': [
        |      {'Product Name': 'Bowler Hat', 'Price': 34.45, 'Quantity': 4},
        |      {'Product Name': 'Cloak', 'Price': 107.99, 'Quantity': 1}]}]}};
        |  $ADDR.Account.Order.Product{`Product Name` : $.(Price*Quantity)} )"""
        .stripMargin,
      Map("Bowler Hat" -> Seq(68.9, 137.8), "Trilby hat" -> 21.67,
        "Cloak" -> 107.99))
  }

  test("count per group via $count") {
    run(s"($orders $$o{cat : $$count($$)})",
      Map("hat" -> 2L, "coat" -> 1L))
  }

  test("computed (non-field) key expression") {
    run(s"($orders $$o{price > 20 ? 'exp' : 'cheap' : $$sum(qty)})",
      Map("cheap" -> 6L, "exp" -> 1L))
  }

  test("multiple kv-pairs with distinct keys merge") {
    run("[{'k':'a','v':1},{'k':'b','v':2}]{k : $sum(v), k & '!' : $sum(v)}",
      Map("a" -> 1L, "b" -> 2L, "a!" -> 1L, "b!" -> 2L))
  }

  test("grouping after a path step (reference test shape)") {
    run(
      """( $data := {'Order': [
        |    {'Product': [{'name': 'Bowler', 'Price': 68.9},
        |                 {'name': 'Trilby', 'Price': 21.67}]},
        |    {'Product': [{'name': 'Bowler', 'Price': 68.9}]}]};
        |  $data.Order.Product{name : $sum(Price)} )""".stripMargin,
      Map("Bowler" -> 137.8, "Trilby" -> 21.67))
  }

  test("scalar context groups as a singleton") {
    run("{'cat': 'x', 'price': 3}{cat : $sum(price)}", Map("x" -> 3L))
  }
}
