package graft.sources

import graft.SparkSpec
import graft.lang.RM

/** Graph/REST `$get`/`$put` through the recorded-fixture resolver
  * (reference builtin.cljc:1555-1624, shape-put/shape-get programs in
  * builtin_test.cljc:925-975). The full round trip: $put a library
  * function's source, $get it back with fn/exe, apply the compiled
  * executable to data.
  */
class GraphSpec extends SparkSpec {

  test("db_name special case returns the connection token") {
    val got = RM.eval(
      "$get(['db_name', 'schemaDB'], ['db_connection'])", spark)
    assert(got.contains(Map("db_connection" -> "_rm_schema-db")))
  }

  test("$put then $get data props; library/fn and library_fn coincide") {
    val r = RM.eval(
      """$put(['library/fn', 'addTwo'],
        |  {'fn_src': 'function($x){$x + 2}',
        |   'fn_doc': 'Add two to a number'})""".stripMargin, spark)
    assert(r.contains("success"))
    val got = RM.eval(
      "$get([['library_fn', 'addTwo'], ['fn_doc']])", spark)
    assert(got.contains(Map("fn_doc" -> "Add two to a number")))
  }

  test("fn/exe member compiles to an applicable function") {
    RM.eval(
      """$put(['library/fn', 'double'],
        |  {'fn_src': 'function($x){$x * 2}'})""".stripMargin, spark)
    val got = RM.eval(
      "($f := $get([['library/fn', 'double'], ['fn/exe']]).fn_exe; $f(21))",
      spark)
    assert(got.contains(42L))
  }

  test("library query function applies to data (shape-get pattern)") {
    val got = RM.eval(
      """( $put(['library/fn', 'parentChild'],
        |    {'fn_src': 'query{[?x :parent ?p] [?x :child ?c]}'});
        |  $pc := $get([['library/fn', 'parentChild'], ['fn/exe']]).fn_exe;
        |  $data := [{'parent': 'a', 'child': 'b'},
        |            {'parent': 'b', 'child': 'c'}];
        |  $pc($data).?c ~> $sort() )""".stripMargin, spark)
    assert(got.contains(Seq("b", "c")))
  }

  test("list-valued props filter by content (builtin_test:511-516)") {
    Graph.resolver.asInstanceOf[Graph.ReplayResolver].record(
      "list_id", "cct_bie", Map("list_content" -> Seq(
        "urn:oagi-10.:elena.2023-02-09.ProcessInvoice-BC_1",
        "urn:oagi-10.:elena.2023-02-09.ProcessInvoice-BC_2",
        "urn:oagi-10.:other.2023-03-01.SomethingElse-BC_1",
        "urn:oagi-10.:elena.2023-07-02.ProcessInvoice-BC_1_v2",
        "urn:oagi-10.:elena.2023-07-02.ProcessInvoice-BC_2_v2")))
    val got = RM.eval(
      "$get(['list_id', 'cct_bie'], ['list_content'])" +
        ".list_content[$contains('elena')]", spark)
    assert(got.contains(Seq(
      "urn:oagi-10.:elena.2023-02-09.ProcessInvoice-BC_1",
      "urn:oagi-10.:elena.2023-02-09.ProcessInvoice-BC_2",
      "urn:oagi-10.:elena.2023-07-02.ProcessInvoice-BC_1_v2",
      "urn:oagi-10.:elena.2023-07-02.ProcessInvoice-BC_2_v2")))
  }

  test("why battery: context quirks (builtin_test:518-524)") {
    assert(RM.eval("'abc'[$]", spark).contains("abc"))
    assert(RM.eval("'abc'.$", spark).contains("abc"))
  }

  test("unrecorded entities fail with the reference's error shape") {
    intercept[IllegalArgumentException] {
      RM.eval("$get([['library/fn', 'missing!'], ['fn_src']])", spark)
    }
    intercept[IllegalArgumentException] {
      RM.eval("$put(['schema/name', 'x'], {'a': 'b'})", spark)
    }
  }
}
