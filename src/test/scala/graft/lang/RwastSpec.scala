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

  test("serialization is stable (same input, same output)") {
    val src = "($x := 5; $map([1,2], function($v){$v + $x}))"
    assert(Rwast.toExchange(src) == Rwast.toExchange(src))
    // and parses to valid JSON
    val parsed = com.fasterxml.jackson.databind.json.JsonMapper.builder()
      .build().readTree(Rwast.toExchange(src))
    assert(parsed.get("typ").asText() == "CodeBlock")
  }
}
