package graft.lang

import graft.SparkSpec

/** The reference's `today` battery verbatim
  * (builtin_test.cljc:318-333) — the path/index quirks over mixed
  * arrays and binding-set literals.
  */
class TodaySpec extends SparkSpec {

  private def run(src: String, expected: Any): Unit = {
    val got = RM.eval(src, spark)
    assert(got.contains(expected),
      s"""RM "$src" => $got, expected Some($expected)""")
  }

  test("today battery (builtin_test.cljc:318-333)") {
    run("-5", -5L)
    run("$x := -5", -5L)
    run("($x := -5)", -5L)
    run("[[1,2,3], 4].$[1]", 2L)
    run("[[1,2,3], 4].$[0][0]", Seq(1L, 4L))
    run("($v := [[1,2,3], 4]; $v.$[0][0])", Seq(1L, 4L))
    run("{'num' : [[1,2,3], 4]}.num.$[0][0]", Seq(1L, 4L))
    run("[{?parent : 2}].?parent", 2L)
    run("[[[1,2,3], 4]].$", Seq(Seq(1L, 2L, 3L), 4L))
    run("[{'nums' : [1, 2]}, {'nums' : [3, 4]}].nums[1]", Seq(2L, 4L))
    run("{'nums' : [[1], 2, 3]}.nums[0]", Seq(1L))
    run("[{'nums' : [1, 2]}, {'nums' : [3, 4]}].nums", Seq(1L, 2L, 3L, 4L))
    run("{'number' : [11, 22, 33, 44]}.number[2]", 33L)
    run("['a', 'b', 'c'].[1]", Seq(Seq(1L), Seq(1L), Seq(1L)))
    run("{'a' : 1, 'b' : 2}.[1]", Seq(1L))
  }
}
