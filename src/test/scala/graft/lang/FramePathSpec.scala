package graft.lang

import graft.SparkSpec

/** Paths and sequence functions over query-result FRAMES — the
  * reference's `$qFn($db).?sdo ~> $distinct() ~> $sort()` shape
  * (query_test some-async). The column select and both functions stay
  * DataFrame ops, so the pipeline never leaves the executors.
  */
class FramePathSpec extends SparkSpec {

  private def run(src: String, expected: Any): Unit = {
    val got = RM.eval(src, spark)
    assert(got.contains(expected),
      s"""RM "$src" => $got, expected Some($expected)""")
  }

  test("qvar path + $distinct + $sort over a query frame") {
    run(
      """( $db := [{'schema_name': 'urn:oagis', 'schema_sdo': 'oagi'},
        |          {'schema_name': 'urn:niem',  'schema_sdo': 'niem'},
        |          {'schema_name': 'urn:oagi2', 'schema_sdo': 'oagi'}];
        |  $qfn := query{[?e :schema_name ?name] [?e :schema_sdo ?sdo]};
        |  $qfn($db).?sdo ~> $distinct() ~> $sort() )""".stripMargin,
      Seq("niem", "oagi"))
  }

  test("$count over a frame") {
    run(
      """( $db := [{'x': 1}, {'x': 2}, {'x': 2}];
        |  $q := query{[?e :x ?x]};
        |  $count($q($db)) )""".stripMargin,
      2L) // set semantics: [1, 2]
  }

  test("chained paths navigate into a loaded JSON document") {
    val p = java.nio.file.Files.createTempFile("doc", ".json")
    java.nio.file.Files.writeString(p,
      """{"Account": {"Name": "Firefly", "Tier": {"level": 3}}}""")
    run(s"$$get('$p').Account.Name", "Firefly")
    run(s"$$get('$p').Account.Tier.level", 3L)
  }

  test("field path over a real-table query frame stays distributed") {
    import spark.implicits._
    val people = Seq((1L, "Bob", "a"), (2L, "Alice", "b"), (3L, "Cy", "a"))
      .toDF("id", "name", "grp")
    val frame = RM.queryFrame(
      "query(){[?p :grp 'a'] [?p :name ?name]}($people).?name",
      spark, Map("people" -> people))
    assert(frame.columns.toSeq == Seq("value"))
    assert(frame.as[String].collect().toSet == Set("Bob", "Cy"))
  }
}
