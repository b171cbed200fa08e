package graft.sources

import graft.SparkSpec
import graft.lang.RM

/** EDN ingestion (`$read('...edn')`) — parser unit cases plus the
  * reference's own fixtures: `data/testing/jsonata/bsets.edn` and the
  * OWL example battery's `data/testing/onto/owl-example.edn`
  * (query_test.cljc:502-540 owl-full-express shapes).
  */
class EdnSpec extends SparkSpec {

  test("EDN scalars, keywords, collections render as JSON") {
    assert(Edn.toJson("nil") == "null")
    assert(Edn.toJson("42") == "42")
    assert(Edn.toJson("-3.5") == "-3.5")
    assert(Edn.toJson("true") == "true")
    assert(Edn.toJson("\"hi\\nthere\"") == "\"hi\\nthere\"")
    assert(Edn.toJson(":rdf/type") == "\"rdf_type\"")
    assert(Edn.toJson("[1, 2, 3]") == "[1,2,3]")
    assert(Edn.toJson("#{1 2}") == "[1,2]")
    assert(Edn.toJson("(:a :b)") == "[\"a\",\"b\"]")
    assert(Edn.toJson("{:a 1, :b \"x\"}") == "{\"a\":1,\"b\":\"x\"}")
    assert(Edn.toJson("; comment\n{:a/b :c/d}") ==
      "{\"a_b\":\"c_d\"}")
    assert(Edn.toJson("#inst \"2024-01-01\"") == "\"2024-01-01\"")
    assert(Edn.toJson("#_ 99 7") == "7")
  }

  test("bsets.edn fixture reads: 8 binding sets, keyword columns") {
    val df = Ingest.readEdn(spark,
      "/root/reference/data/testing/jsonata/bsets.edn")
    assert(df.count() == 8)
    // qvar-keyed EDN maps: keys keep the ? prefix, values normalize
    val cols = df.columns.toSet
    assert(cols.contains("?id") && cols.contains("?deviceName"), cols)
    import org.apache.spark.sql.functions.col
    val ids = df.select(col("`?id`")).collect().map(_.getLong(0)).toSet
    assert(ids == Set(100L, 200L, 300L, 400L, 500L, 600L, 700L, 800L))
  }

  test("owl-example.edn: text-surface read + class query + express (query_test:502-540)") {
    val got = RM.eval(
      """( $data := $read('/root/reference/data/testing/onto/owl-example.edn');
        |  $qtype  := query($rdfType)
        |               { [?class :rdf_type            $rdfType]
        |                 [?class :resource_iri        ?class-iri]
        |                 [?class :resource_namespace  ?class-ns]
        |                 [?class :resource_name       ?class-name] };
        |  $etype  := express($tableType)
        |              {  {'instance-of'  : 'insert-row',
        |                  'table'        : $tableType,
        |                  'content'      : {'resourceIRI'       : ?class-iri,
        |                                    'resourceNamespace' : ?class-ns,
        |                                    'resourceLabel'     : ?class-name}} };
        |  $quClass := $qtype('owl_Class');
        |  $enClassTable := $etype('ClassDefinition');
        |  $clasBsets := $quClass($data);
        |  $map($clasBsets, $enClassTable) )""".stripMargin, spark)
    assert(got.contains(Map(
      "instance-of" -> "insert-row",
      "table" -> "ClassDefinition",
      "content" -> Map(
        "resourceIRI" -> "dol_endurant",
        "resourceNamespace" -> "dol",
        "resourceLabel" -> "endurant"))), s"got $got")
  }

  test("owl-example.edn: property query binds both ObjectProperties") {
    val got = RM.eval(
      """( $data := $read('/root/reference/data/testing/onto/owl-example.edn');
        |  $q := query(){ [?c :rdf_type 'owl_ObjectProperty']
        |                 [?c :resource_iri ?iri] };
        |  $q($data) )""".stripMargin, spark)
    assert(got.get.asInstanceOf[Seq[Any]].toSet == Set(
      Map("iri" -> "dol_participant"),
      Map("iri" -> "dol_participant-in")), s"got $got")
  }
}
