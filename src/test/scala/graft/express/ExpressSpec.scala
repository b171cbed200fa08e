package graft.express

import graft.SparkSpec
import graft.express.Express._

/** Golden tests for express{} semantics, mirrored from the reference's
  * query_test.cljc express-reduce battery (757-880).
  */
class ExpressSpec extends SparkSpec {
  import spark.implicits._

  private def bsetsFlat =
    Seq((100, "100-1", "100-2"), (200, "200-1", "200-2"))
      .toDF("id", "aAttr", "bAttr")

  test("reduce: flat template with key() merges per key (query_test 757-771)") {
    val tmpl = XObj.of(
      KKey("id", "id") -> XLit(null),
      KLit("aAttr") -> XVar("aAttr"),
      KLit("bAttr") -> XVar("bAttr"))
    val out = reduceBsets(bsetsFlat, tmpl).orderBy("id")
    assert(out.columns.toSeq == Seq("id", "aAttr", "bAttr"))
    assert(out.as[(Int, String, String)].collect().toSeq ==
      Seq((100, "100-1", "100-2"), (200, "200-1", "200-2")))
  }

  test("reduce: duplicate bsets collapse by key path") {
    val dup = bsetsFlat.union(bsetsFlat)
    val tmpl = XObj.of(
      KKey("id", "id") -> XLit(null),
      KLit("aAttr") -> XVar("aAttr"))
    assert(reduceBsets(dup, tmpl).count() == 2)
  }

  test("reduce: nested key levels build sorted child arrays (query_test 820-851)") {
    // owner -> systems -> devices
    val bs = Seq(
      ("o1", "s1", "d1", "ok"), ("o1", "s1", "d2", "bad"),
      ("o1", "s2", "d3", "ok"), ("o2", "s1", "d4", "ok"))
      .toDF("o", "s", "d", "status")
    val tmpl = XObj.of(
      KLit("owners") -> XArr(XObj.of(
        KKey("owner_id", "o") -> XLit(null),
        KLit("systems") -> XArr(XObj.of(
          KKey("system_id", "s") -> XLit(null),
          KLit("devices") -> XArr(XObj.of(
            KKey("device_id", "d") -> XLit(null),
            KLit("status") -> XVar("status"))))))))
    val json = reduceBsets(bs, tmpl).toJSON.collect().mkString
    val expected =
      """{"owners":[""" +
        """{"owner_id":"o1","systems":[""" +
          """{"system_id":"s1","devices":[""" +
            """{"device_id":"d1","status":"ok"},""" +
            """{"device_id":"d2","status":"bad"}]},""" +
          """{"system_id":"s2","devices":[""" +
            """{"device_id":"d3","status":"ok"}]}]},""" +
        """{"owner_id":"o2","systems":[""" +
          """{"system_id":"s1","devices":[""" +
            """{"device_id":"d4","status":"ok"}]}]}]}"""
    assert(json == expected)
  }

  test("reduce: qvar-in-key-position builds merged maps (query_test 853-880)") {
    val bs = Seq(("Bob", "watch"), ("Bob", "phone"), ("Alice", "laptop"))
      .toDF("name", "dev")
    // {?name: {'devices': [{'device': key(?dev)}]}}
    val tmpl = XObj.of(
      KVar("name") -> XObj.of(
        KLit("devices") -> XArr(XObj.of(
          KKey("device", "dev") -> XLit(null)))))
    val json = reduceBsets(bs, tmpl).toJSON.collect().mkString
    assert(json ==
      """{"doc":{"Alice":{"devices":[{"device":"laptop"}]},""" +
      """"Bob":{"devices":[{"device":"phone"},{"device":"watch"}]}}}""")
  }

  test("map: pure per-bset projection (query_test 704-750)") {
    val bs = Seq((1, "a"), (2, "b")).toDF("id", "v")
    val tmpl = XObj.of(
      KLit("ident") -> XVar("id"),
      KLit("nested") -> XObj.of(KLit("val") -> XVar("v")))
    val json = mapBsets(bs, tmpl).toJSON.collect().toSeq
    assert(json == Seq(
      """{"doc":{"ident":1,"nested":{"val":"a"}}}""",
      """{"doc":{"ident":2,"nested":{"val":"b"}}}"""))
  }

  test("map: qvar-in-key-position makes one-entry maps") {
    val bs = Seq(("Bob", 1), ("Alice", 2)).toDF("name", "n")
    val tmpl = XObj.of(KVar("name") -> XVar("n"))
    val json = mapBsets(bs, tmpl).toJSON.collect().toSeq
    assert(json == Seq("""{"doc":{"Bob":1}}""", """{"doc":{"Alice":2}}"""))
  }
}
