package graft.lang

import graft.SparkSpec

/** Text-surface `$qIdent`/`$eIdent` conformance — the runnable parts
  * of the reference's query-identity (query_test.cljc:1064-1087) and
  * redex-idents (1117-1132) batteries.
  */
class IdentTextSpec extends SparkSpec {

  private def identCode(dataLit: String): String =
    s"""( $$data  := $dataLit;
       |  $$qFn   := query{$$qIdent($$data)};
       |  $$bSets := $$qFn($$data);
       |  $$eFn   := express{$$eIdent($$data)};
       |  $$reduce($$bSets, $$eFn) )""".stripMargin

  private def run(src: String, expected: Any): Unit = {
    val got = RM.eval(src, spark)
    assert(got.contains(expected),
      s"""RM "$src" => $got, expected Some($expected)""")
  }

  test("qIdent used in a query (query_test:1077-1081)") {
    run(
      """( $data  := {'id' : 123, 'aAttr' : {'val' : 'A-value'}};
        |  $qFn   := query{$qIdent($data)};
        |  $qFn($data) )""".stripMargin,
      Map("v1" -> 123L, "v2" -> "A-value"))
  }

  test("qIdent + eIdent round trip (query_test:1083-1087)") {
    run(identCode("{'id' : 123, 'aAttr' : {'val' : 'A-value'}}"),
      Map("id" -> 123L, "aAttr" -> Map("val" -> "A-value")))
  }

  test("simple redex identity (query_test:1117-1122)") {
    run(identCode("{'abc' : 123}"), Map("abc" -> 123L))
    run(identCode("{'abc' : 123, 'xyz' : 456}"),
      Map("abc" -> 123L, "xyz" -> 456L))
  }

  test("deep redex identity (reference builtin $qIdent doc shape, query_test:1066-1076)") {
    // the documented generation example, executed end-to-end: nested
    // structs at two levels plus a cardinality-many scalar
    run(identCode(
      """{'id' : [123, 456],
        |  'aAttr' : {'aval'  : 'A-value',
        |             'cval' : {'ccval': 'C-value'}},
        |  'bAttr' : {'bval' : 'B-value'}}""".stripMargin),
      Map(
        "id" -> Seq(123L, 456L),
        "aAttr" -> Map("aval" -> "A-value",
          "cval" -> Map("ccval" -> "C-value")),
        "bAttr" -> Map("bval" -> "B-value")))
  }
}
