// Scratch: do two wildcard-ENTITY patterns ([_ :a ?x] [_ :b ?y])
// agree between the EAV path (independent bindings, cross product)
// and the direct path's (src, e)-grouping (which would conjoin them
// row-locally)? Datalog semantics: _ binds nothing, so the two
// patterns are independent.
package graft.tools

import graft.query.QueryCompiler
import graft.query.QueryCompiler.{C, Pattern, V, W}
import graft.shred.Shred

object WildEntProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("4")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("id", "k", "n")
    val pats = Seq(Pattern(W, C("k"), V("x")),
      Pattern(W, C("n"), V("y")))
    val eav = QueryCompiler.run(Map("default" -> Shred.shred(df,
      Some("id"))), pats)
    val doc = QueryCompiler.runDocsBoxed(
      Map("default" -> QueryCompiler.DocSource(df, "id")), pats)
    val docU = doc.select(doc.columns.toSeq.map(c =>
      doc(c).getField("v").as(c)): _*)
    println("EAV rows=" + eav.count())
    eav.orderBy("x", "y").show(20, false)
    println("DOC rows=" + docU.count())
    docU.orderBy("x", "y").show(20, false)
    val native = QueryCompiler.runDocsNative(
      Map("default" -> QueryCompiler.DocSource(df, "id")), pats)
    println("NATIVE engaged=" + native.isDefined)
    native.foreach(n => println("NATIVE rows=" + n.count()))
    spark.stop()
  }
}
