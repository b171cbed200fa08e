package graft.lang

import graft.SparkSpec

/** Heterogeneous sequences through the text surface — the reference's
  * dynamic data model allows mixed-kind arrays freely (jflatten
  * battery, builtin_test.cljc:18-42); Spark's typed arrays can't, so
  * the compiler routes un-unifiable literals through VariantType and
  * the finalizer restores plain values.
  */
class HeteroSpec extends SparkSpec {

  private def run(src: String, expected: Any): Unit = {
    val got = RM.eval(src, spark)
    assert(got.contains(expected),
      s"""RM "$src" => $got, expected Some($expected)""")
  }

  test("explicit mixed array of scalars and arrays (jflatten rule 3)") {
    run("[1, 2, 3, [4, 5], 6]",
      Seq(1L, 2L, 3L, Seq(4L, 5L), 6L))
  }

  test("explicit arrays never flatten, however ragged (rule 3/4 shape)") {
    run("[1, [[2]], [3], [[[4, [5], [[6]]]]]]",
      Seq(1L, Seq(Seq(2L)), Seq(3L),
        Seq(Seq(Seq(4L, Seq(5L), Seq(Seq(6L)))))))
  }

  test("mixed scalar types") {
    run("[1, 'a', true, null]", Seq(1L, "a", true, null))
  }

  test("mixed array with objects") {
    run("[{'a': 1}, 2, 'x']", Seq(Map("a" -> 1L), 2L, "x"))
  }

  test("indexing a mixed array (non-compositional aref)") {
    run("[[1, 2, 3], 4][0]", Seq(1L, 2L, 3L))
    run("[[1, 2, 3], 4][1]", 4L)
    run("[[1, 2, 3], 4][-1]", 4L)
  }

  test("$count and $reverse over mixed arrays") {
    run("$count([[1, 2, 3], 4])", 2L)
    run("$reverse([1, 'a', [2]])", Seq(Seq(2L), "a", 1L))
  }

  test("homogeneous literals keep their native channel") {
    run("[1, 2, 3]", Seq(1L, 2L, 3L))
    run("[[1, 2], [3]]", Seq(Seq(1L, 2L), Seq(3L)))
  }

  test("field step over a mixed array: non-objects drop (no match)") {
    run("[{'a': 1}, 2, {'a': 3}].a", Seq(1L, 3L))
    run("[{'a': 1}, 2].a", 1L) // singleton collapse
    run("[{'b': 1}, 'x'].a ? 'matched' : 'empty'", "empty")
  }

  test("field step over mixed elements splices array values") {
    run("[{'a': [1, 2]}, {'a': 3}].a", Seq(1L, 2L, 3L))
  }

  test("field step after indexing a mixed array") {
    run("[[1, 2], {'a': 5}][1].a", 5L)
  }

  test("chained field steps through mixed objects") {
    run("[{'a': {'b': 7}}, 2, {'a': {'b': 8}}].a.b", Seq(7L, 8L))
  }

  // ---- path steps over variant (mixed) sequences ----

  test("map-step over mixed elements: identity and $type") {
    run("[1, 'a', 2].($)", Seq(1L, "a", 2L))
    run("[1, 'a', 2].($type($))", Seq("number", "string", "number"))
    run("[1, [2, 'x'], 'y'].$string($)", Seq("1", "[2,\"x\"]", "y"))
  }

  test("filter-step predicates over mixed elements") {
    run("[{'a': 1}, 5, {'a': 3}][a = 1]", Map("a" -> 1L))
    run("[1, 'a', 2][$ = 'a']", "a")
    run("[1, 'a', 2][$type($) = 'number']", Seq(1L, 2L))
  }

  test("non-number predicate over a mixed array filters by truthiness") {
    // the reference treats ONLY a number-valued bracket as an index
    // (builtin.cljc:206-243 `(if (number? prix)`); a range evaluates
    // to an array → predicate behavior, truthy for every element
    run("[1, 'a', 2][0..1]", Seq(1L, "a", 2L))
  }

  test("value-step over mixed elements") {
    run("[1, 'a'].['x']", Seq(Seq("x"), Seq("x")))
  }

  test("arithmetic on a numeric variant element computes") {
    run("[1, 'a'][0] + 1", 2L)
    run("[1, 2.5, 'z'][1] * 2", 5.0d)
  }

  test("arithmetic on a non-numeric variant element raises the JSONata error") {
    val e = intercept[Exception] {
      RM.eval("[1, 'a'][1] + 1", spark)
    }
    assert(e.getMessage.contains(
      "The left side of the '+' operator must evaluate to a number"),
      s"unexpected error: ${e.getMessage}")
    val e2 = intercept[Exception] {
      RM.eval("[1, 'a', 2].($ * 2)", spark)
    }
    assert(e2.getMessage.contains(
      "The left side of the '*' operator must evaluate to a number"),
      s"unexpected error: ${e2.getMessage}")
  }

  test("numeric builtins over variant elements coerce per row") {
    run("$floor([2.7, 'a'][0])", 2L)
    run("$ceil([1, 2.1, 'z'][1])", 3L)
    run("$abs([-3, 'x'][0])", 3.0d)
    run("$sqrt([9, 'x'][0])", 3.0d)
    run("$power([2, 'x'][0], 3)", 8.0d)
    run("$round([2.5, 'x'][0])", 2.0d) // HALF_EVEN
  }

  test("numeric builtins over non-numeric variants raise the JSONata error") {
    val e = intercept[Exception] {
      RM.eval("$floor([1, 'a'][1])", spark)
    }
    assert(e.getMessage.contains("must evaluate to a number"),
      s"unexpected error: ${e.getMessage}")
  }

  test("equality through the variant channel is type-strict") {
    run("[1, '1'][$ = 1]", 1L)       // number 1 matches, string '1' not
    run("[1, '1'][$ = '1']", "1")
    run("[2, 'b'][$ = 1] ? 'hit' : 'none'", "none")
  }

  test("string concatenation with variant operands") {
    run("[1, 'a'][1] & '!'", "a!")
    run("[1, 'a'][0] & '!'", "1!")
  }

  test("membership and $distinct over mixed arrays") {
    run("'a' in [1, 'a'] ? 'yes' : 'no'", "yes")
    run("1 in [1, 'a'] ? 'yes' : 'no'", "yes")
    run("5 in [1, 'a'] ? 'yes' : 'no'", "no")
    run("1 in ['1'] ? 'yes' : 'no'", "no") // type-strict like =
    run("$distinct([1, 'a', 1, 'a', 2])", Seq(1L, "a", 2L))
  }

  test("empty arrays and objects survive the variant channel") {
    run("[[], 71, 'q1']", Seq(Seq(), 71L, "q1"))
    run("[[], 71, 'q1'][0]", Seq())
    run("[{}, 36]", Seq(Map(), 36L))
    run("['b', false, [], 'x'].($type($))",
      Seq("string", "boolean", "array", "string"))
  }

  test("field steps over non-objects are no-match, not errors") {
    run("[1, 2].a ? 'hit' : 'none'", "none")
    run("['b'].a ? 'hit' : 'none'", "none")
    run("[{'b': 1}, {'b': 2}].a ? 'hit' : 'none'", "none") // absent field
  }

  test("typed equality is type-strict like the reference") {
    run("'5' = 5 ? 'eq' : 'ne'", "ne")
    run("[1, 2][$ = 'a'] ? 'hit' : 'none'", "none")
    run("['5'][$ = 5] ? 'hit' : 'none'", "none")
    run("[true][$ = 1] ? 'hit' : 'none'", "none")
  }

  // ---- the reference jflatten battery (builtin_test.cljc:18-42),
  //      driver-side container semantics mirrored 1:1 ----

  import graft.core.Finalize
  import graft.core.Finalize.Container

  test("jflatten rule 1: empty container is no-match") {
    assert(Finalize.jflatten(Container(Nil)).isEmpty)
  }

  test("jflatten rule 1: map keys with empty-container values drop") {
    assert(Finalize.jflatten(Map("match" -> "foo", "index" -> 2,
      "groups" -> Container(Nil)))
      == Some(Map("match" -> "foo", "index" -> 2)))
  }

  test("jflatten rule 2: singleton container unwraps") {
    assert(Finalize.jflatten(Container(Seq(1))) == Some(1))
  }

  test("jflatten rule 3: explicit JSON arrays do not flatten") {
    assert(Finalize.jflatten(Seq(1, 2, 3, Seq(4, 5), 6))
      == Some(Seq(1, 2, 3, Seq(4, 5), 6)))
  }

  test("jflatten rule 4: nested containers splice up") {
    // containerize of [1 [[2]] [3] [[[4 [5] [[6]]]]]] → [1 2 3 4 5 6]
    def c(xs: Any*) = Container(xs)
    assert(Finalize.jflatten(
      c(1, c(c(2)), c(3), c(c(c(4, c(5), c(c(6)))))))
      == Some(Seq(1, 2, 3, 4, 5, 6)))
  }
}
