package graft.query

import graft.SparkSpec
import graft.shred.Shred
import graft.query.QueryCompiler.{C, DocSource, Pattern, V}

/** runDocs (direct, unshredded compilation) must agree with the EAV
  * path bit-for-bit and plan without any generator (explode).
  */
class DirectQuerySpec extends SparkSpec {
  import spark.implicits._

  private def people =
    Seq((1L, "Bob", "a", 10.0), (2L, "Alice", "b", 20.0),
      (3L, "Carol", "a", 30.0)).toDF("id", "name", "grp", "bal")
  private def devices =
    Seq((101L, 1L, "watch"), (102L, 1L, "phone"), (103L, 3L, "laptop"))
      .toDF("did", "owner", "dname")

  private val pats = Seq(
    Pattern(V("p"), C("grp"), C("a"), "people"),
    Pattern(V("p"), C("id"), V("pid"), "people"),
    Pattern(V("p"), C("name"), V("who"), "people"),
    Pattern(V("d"), C("owner"), V("pid"), "devices"),
    Pattern(V("d"), C("dname"), V("dev"), "devices"))

  test("direct compilation matches the EAV path") {
    val eav = QueryCompiler.run(
      Map("people" -> Shred.shred(people), "devices" -> Shred.shred(devices)),
      pats).orderBy("who", "dev")
    val direct = QueryCompiler.runDocs(
      Map("people" -> DocSource(people, "id"),
        "devices" -> DocSource(devices, "did")),
      pats).orderBy("who", "dev")
    assert(direct.columns.toSeq == eav.columns.toSeq)
    assert(direct.collect().toSeq == eav.collect().toSeq)
    assert(direct.count() == 3) // watch+phone for Bob, laptop for Carol
  }

  test("direct plan has no explode and fuses same-entity patterns") {
    val direct = QueryCompiler.runDocs(
      Map("people" -> DocSource(people, "id"),
        "devices" -> DocSource(devices, "did")), pats)
    val plan = direct.queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"), s"explode in direct plan:\n$plan")
    // 5 patterns over 2 entities → exactly one join, not four
    val eavPlan = QueryCompiler.run(
      Map("people" -> Shred.shred(people), "devices" -> Shred.shred(devices)),
      pats).queryExecution.executedPlan.toString
    def count(s: String, what: String) = s.sliding(what.length).count(_ == what)
    assert(count(plan, "Join") < count(eavPlan, "Join"))
  }

  test("numeric canonical encoding matches across paths") {
    val p2 = Seq(Pattern(V("p"), C("bal"), V("b"), "people"))
    val eav = QueryCompiler.run(Map("people" -> Shred.shred(people)), p2)
      .orderBy("b").as[String].collect().toSeq
    val direct = QueryCompiler.runDocs(
      Map("people" -> DocSource(people, "id")), p2)
      .orderBy("b").as[String].collect().toSeq
    assert(direct == eav && direct == Seq("10", "20", "30"))
  }
}
