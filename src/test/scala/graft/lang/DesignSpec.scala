package graft.lang

import graft.SparkSpec

/** The reference's `code-block-evaluations` and `design` batteries
  * verbatim (builtin_test.cljc:483-600) — code blocks, closures,
  * context-variable semantics, parenthesization invariance, and the
  * try.json document-context cases against the reference's own
  * fixture file.
  */
class DesignSpec extends SparkSpec {

  private def run(src: String, expected: Any): Unit = {
    val got = RM.eval(src, spark)
    assert(got.contains(expected),
      s"""RM "$src" => $got, expected Some($expected)""")
  }

  test("code blocks: map/reduce with bound functions (483-489)") {
    run("($inc := function($i)    {$i + 1};  $map([1..5], $inc))",
      Seq(2L, 3L, 4L, 5L, 6L))
    run("($add := function($i, $j){$i + $j}; $reduce([1..5], $add))", 15L)
    run("($add := function($i, $j){$i + $j}; $reduce([1..5], $add, 100))",
      115L)
  }

  test("code blocks: array indexing (491-496)") {
    run("($v := ['a', 'b', 'c', 'd']; $v[1])", "b")
    run("($v := ['a', 'b', 'c', 'd']; $v[-4])", "a")
    run("($v := ['a', 'b', 'c', 'd']; $v[0])", "a")
    run("['a', 'b', 'c'].[1]", Seq(Seq(1L), Seq(1L), Seq(1L)))
  }

  test("filter and map delimited expressions (498-509)") {
    run(
      """($p := [{'Phone' : {'type' : 'mobile', 'num' : '555-123-4567'}},
        |        {'Phone' : {'type' : 'work',   'num' : 'XXX-123-4567'}},
        |        {'Phone' : {'type' : 'mobile', 'num' : '555-333-4444'}}]; /* I'm commenting! */
        | $p.Phone[type = 'mobile'] )""".stripMargin,
      Seq(Map("type" -> "mobile", "num" -> "555-123-4567"),
        Map("type" -> "mobile", "num" -> "555-333-4444")))
    run(
      """($p := [{'Product' : {'price' : 50, 'quantity' : 2}},
        |        {'Product' : {'price' : 50, 'quantity' : 4}}];
        | $p.Product.(price * quantity) )""".stripMargin,
      Seq(100L, 200L))
  }

  test("design: context variable semantics (526-560)") {
    run("'abc'[0]", "abc")
    run("$var := 3", 3L)
    run("[1 , 2, 3].$", Seq(1L, 2L, 3L))
    run("( $v := {'a' : {'b' : {'c' : 123}}}; $v.a.b.c.$ )", 123L)
    run("[1,2,3].[$]", Seq(Seq(1L), Seq(2L), Seq(3L)))
    run("( $v := {'a' : {'b' : {'c' : 123}}}; $v.a.b.c )", 123L)
    run("{'a' : {'b' : {'c' : 123}}}.a.b.c", 123L)
    run("{'a' : {'b' : {'c' : 123}}}.a.b.c.$", 123L)
    run("['a', 'b', 'c'].$sum([50, 50])", Seq(100L, 100L, 100L))
    run("( $v := [1, 2, 3]; $sum($v) )", 6L)
  }

  test("design: precedence and parenthesization invariance (562-590)") {
    run("($v := {'a' : 1, 'b' : 2, 'c' : 3, 'd' : 4}; $v.(a + b * c + d) )",
      11L)
    run("{'a' : 1, 'b' : 2, 'c' : 3, 'd' : 4}.(a + b * c + d)", 11L)
    run("{'a' : 10, 'b' : 2}.(( a * (b * 2 )))", 40L)
    run("((32))", 32L)
    run("1 + (({'a' : 1})).((a + 44))", 46L)
    run("((({'a' : 1})))[a = 1]", Map("a" -> 1L))
    run("({'a' : 1})[a = 1]", Map("a" -> 1L))
    run("($incAmt := 3; $inc := function($n){$n + $incAmt}; $inc(5))", 8L)
    run("{'a' : 1, 'b' : 2}.($x := 3)", 3L)
  }

  test("design: document context from the reference try.json (592-599)") {
    val fixture = "/root/reference/data/testing/jsonata/try.json"
    assume(new java.io.File(fixture).exists())
    run(
      s"""( $$ := $$get('$fixture');
         |  Account.Order.Product.(Price*Quantity) )""".stripMargin,
      Seq(68.9, 21.67, 137.8, 107.99))
    run(
      s"""( $$ := $$get('$fixture');
         |  $$sum(Account.Order.Product.(Price*Quantity)) )""".stripMargin,
      336.36)
  }
}
