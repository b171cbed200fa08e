package graft.shred

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Identity round-trip conformance (reference query_test.cljc:1117-1132):
  * data → shred → qIdent query → eIdent reduce → same data (canonical
  * string leaves).
  */
class IdentitiesSpec extends SparkSpec {
  import spark.implicits._

  test("flat entity round trip") {
    val df = Seq((1L, "Bob", 10.5), (2L, "Alice", 20.0))
      .toDF("id", "name", "bal")
    val rt = Identities.roundTrip(df, Some("id"))
    assert(rt.columns.toSeq == Seq("id", "name", "bal"))
    val rows = rt.orderBy("id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(rows == Seq(("1", "Bob", "10.5"), ("2", "Alice", "20")))
  }

  test("nested structs and arrays of structs round trip") {
    val df = spark.read.json(Seq(
      """{"id": 1, "addr": {"city": "Oslo", "zip": "0150"},
         "pets": [{"name": "Ada"}, {"name": "Rex"}]}""",
      """{"id": 2, "addr": {"city": "Bergen", "zip": "5003"},
         "pets": [{"name": "Max"}]}""").toDS())
      .select("id", "addr", "pets") // fix column order
    val rt = Identities.roundTrip(df, Some("id"))
    val json = rt.orderBy("id").toJSON.collect().toSeq
    assert(json == Seq(
      """{"id":"1","addr":{"city":"Oslo","zip":"0150"},""" +
        """"pets":[{"name":"Ada"},{"name":"Rex"}]}""",
      """{"id":"2","addr":{"city":"Bergen","zip":"5003"},""" +
        """"pets":[{"name":"Max"}]}"""))
  }

  test("cardinality-many scalar arrays round trip") {
    val df = spark.read.json(Seq(
      """{"id": 7, "tags": ["b", "a", "c"]}""").toDS())
      .select("id", "tags")
    val rt = Identities.roundTrip(df, Some("id"))
    val json = rt.toJSON.collect().toSeq
    // bag semantics via the EAV store: order normalizes to sorted
    assert(json == Seq("""{"id":"7","tags":["a","b","c"]}"""))
  }
}
