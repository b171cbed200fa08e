package graft.lang

import org.scalatest.funsuite.AnyFunSuite

/** Exchange-form serialization goldens (rwast.cljc analog). */
class RwastSpec extends AnyFunSuite {

  test("scalar and path expressions serialize canonically") {
    assert(Rwast.toExchange("1 + 2 * 3") ==
      """{"typ": "BinOp", "op": "+", "lhs": {"typ": "Num", "val": 1}, """ +
      """"rhs": {"typ": "BinOp", "op": "*", "lhs": {"typ": "Num", "val": 2}, """ +
      """"rhs": {"typ": "Num", "val": 3}}}""")
    assert(Rwast.toExchange("a.b") ==
      """{"typ": "PathStep", "src": {"typ": "Field", "name": "a"}, """ +
      """"step": {"typ": "Field", "name": "b"}}""")
  }

  test("query and express defs serialize with full structure") {
    val s = Rwast.toExchange("query(){[?e :name ?n]}")
    assert(s.contains(""""typ": "QueryDef""""))
    assert(s.contains(""""role": "name""""))
    assert(s.contains(""""typ": "Qvar", "name": "n""""))
    val e = Rwast.toExchange("express(){{'a' : key(?k)}}")
    assert(e.contains(""""typ": "ExpressDef""""))
  }

  test("serializer is total over the conformance-suite expressions") {
    val samples = Seq(
      "-5", "1 & 2 & 'abc'", "($x := -5)",
      "[{'a' : 1}, {'a' : 2}].( a + 1 )",
      "[{'nums' : [1, 2]}, {'nums' : [3, 4]}].nums[1]",
      "{'letter' : ['a', 'b']}.letter[$ = 'b']",
      "$match('ab', /a(b)/)",
      "function($x){$x+1}(3)",
      "4 ~> function($x){$x+1}()",
      "$reduce([1..5], function($i, $j){$i + $j}, 2)",
      "query($n, <|keepDBid: true|>){[$DB ?e :name $n] [($contains(?x, /y/))]}",
      "express($t){{?k : {'a' : key(?q), 'b' : $t, 'c' : [?v]}}}",
      "/* c */ 5 > 3 ? 'big' : 'small'")
    samples.foreach { s =>
      val out = Rwast.toExchange(s)
      assert(out.nonEmpty && out.startsWith("{"), s"failed for: $s")
      // well-formed JSON
      com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
        .readTree(out)
    }
  }

  test("serialization is stable (same input, same output)") {
    val src = "($x := 5; $map([1,2], function($v){$v + $x}))"
    assert(Rwast.toExchange(src) == Rwast.toExchange(src))
    // and parses to valid JSON
    val parsed = com.fasterxml.jackson.databind.json.JsonMapper.builder()
      .build().readTree(Rwast.toExchange(src))
    assert(parsed.get("typ").asText() == "CodeBlock")
  }
}
