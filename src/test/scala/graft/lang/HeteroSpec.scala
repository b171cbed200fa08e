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
}
