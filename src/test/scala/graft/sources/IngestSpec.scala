package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IngestSpec extends SparkSpec {

  test("xml simplification: attrs fold in, repeats become arrays, ns_name") {
    val xml =
      """<inv:order xmlns:inv="http://x" id="7">
        |  <customer>Bob</customer>
        |  <item sku="a"><qty>2</qty></item>
        |  <item sku="b"><qty>1</qty></item>
        |</inv:order>""".stripMargin
    val df = Ingest.readXmlString(spark, xml)
    assert(df.columns.toSeq == Seq("inv_order"))
    val row = df.select(
      col("inv_order.id"), col("inv_order.customer"),
      size(col("inv_order.item")).as("n"),
      col("inv_order.item")(0).getField("sku"),
      col("inv_order.item")(1).getField("qty")).head()
    assert(row.getString(0) == "7")
    assert(row.getString(1) == "Bob")
    assert(row.getInt(2) == 2)
    assert(row.getString(3) == "a")
    assert(row.getString(4) == "1")
  }

  test("json string ingestion infers schema") {
    val df = Ingest.readJsonString(spark,
      """{"a": 1, "b": {"c": [1,2,3]}}""")
    assert(df.select(size(col("b.c"))).head().getInt(0) == 3)
    // $schemaFor: inferred schema surfaces as JSON
    assert(Ingest.schemaFor(df).contains("\"name\":\"a\""))
    // $addSchema: union, overlay wins on conflicts
    import org.apache.spark.sql.types._
    val merged = Ingest.addSchema(
      StructType(Seq(StructField("a", LongType),
        StructField("b", StringType))),
      StructType(Seq(StructField("b", DoubleType),
        StructField("c", BooleanType))))
    assert(merged.fieldNames.toSeq == Seq("a", "b", "c"))
    assert(merged("b").dataType == DoubleType)
  }

  test("xml feeds the relational core: ingest -> shred -> query") {
    import graft.query.QueryCompiler
    import graft.query.QueryCompiler.{C, Pattern, V}
    val xml =
      """<orders>
        |  <order id="1"><customer>Bob</customer><total>10</total></order>
        |  <order id="2"><customer>Alice</customer><total>20</total></order>
        |</orders>""".stripMargin
    val df = Ingest.readXmlString(spark, xml)
      .select(explode(col("orders.order")).as("o")).select("o.*")
    val bsets = QueryCompiler.run(
      graft.shred.Shred.shred(df, Some("id")),
      Seq(Pattern(V("e"), C("customer"), V("who")),
        Pattern(V("e"), C("total"), V("amt"))))
    val rows = bsets.orderBy("who").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows == Seq(("Alice", "20"), ("Bob", "10")))
  }

  test("csv spreadsheet reads header-keyed; xlsx refuses clearly") {
    val p = java.nio.file.Files.createTempFile("sheet", ".csv")
    java.nio.file.Files.writeString(p, "name,qty\nax,2\nbx,5\n")
    val df = Ingest.readSpreadsheet(spark, p.toString)
    assert(df.columns.toSeq == Seq("name", "qty"))
    assert(df.agg(sum("qty")).head().getLong(0) == 7L)
    intercept[UnsupportedOperationException] {
      Ingest.readSpreadsheet(spark, "/tmp/x.xlsx")
    }
  }
}
