package graft.lang

import graft.SparkSpec

/** Object functions over COMPUTED struct values (not just literals) in
  * the text surface — text programs build objects as Spark structs, so
  * every §2.7 function needs the static-struct path; `$merge` merges
  * any struct-typed args with last-wins values and first-occurrence
  * key order (reference builtin.cljc:1117-1120).
  */
class ObjFnStructSpec extends SparkSpec {

  private def run(src: String, expected: Any): Unit = {
    val got = RM.eval(src, spark)
    assert(got.contains(expected),
      s"""RM "$src" => $got, expected Some($expected)""")
  }

  test("$merge over bound struct variables") {
    run("($a := {'x': 1}; $b := {'y': 2}; $merge([$a, $b]))",
      Map("x" -> 1L, "y" -> 2L))
    run("($a := {'x': 1}; $merge([$a, {'z': 2}]))",
      Map("x" -> 1L, "z" -> 2L))
    run("($a := {'x': 1}; $b := {'x': 9}; $merge([$a, $b]))",
      Map("x" -> 9L))
    run("($a := {'x': 1}; $merge([$a, $assoc($a, 'y', 3)]))",
      Map("x" -> 1L, "y" -> 3L))
  }

  test("object fns over computed structs") {
    run("($a := {'x': 1, 'y': 2}; $keys($a))", Seq("x", "y"))
    run("($a := {'x': 1}; $lookup($a, 'x'))", 1L)
    run("($a := {'x': 1}; $assoc($a, 'z', 9))",
      Map("x" -> 1L, "z" -> 9L))
    run("($a := {'x': 1, 'y': 5}; $sift($a, function($v){$v > 1}))",
      Map("y" -> 5L))
    run("($a := {'x': 1, 'y': 5}; $each($a, function($v, $k){$v}))",
      Seq(1L, 5L))
    run("($a := {'x': 1, 'y': 5}; $spread($a))",
      Seq(Map("x" -> 1L), Map("y" -> 5L)))
    run("($a := {'x': 1}; $update($a, 'x', function($v){$v + 1}))",
      Map("x" -> 2L))
    run("($a := {'x': 1}; $mapObject($a, function($v, $k){$v * 2}))",
      Map("x" -> 2L))
    run("($a := {'x': 1}; $type($a))", "object")
  }
}
