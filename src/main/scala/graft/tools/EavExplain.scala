// Scratch: formatted plans of the EavProbe join2 stage, typed vs canon.
//   sbt "runMain graft.tools.EavExplain /tmp/graft_sf1"
package graft.tools

import graft.query.QueryCompiler
import graft.query.QueryCompiler.{C, Pattern, V}
import graft.shred.Shred

object EavExplain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = graft.Sessions.local("8")
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.Tables.lineitem(spark, sfDir)
    val join2 = Seq(
      Pattern(V("e"), C("l_orderkey"), V("ok")),
      Pattern(V("e"), C("l_quantity"), V("qty")))
    println("########## TYPED ##########")
    QueryCompiler.runBoxed(Map("default" -> Shred.shred(li)), join2)
      .explain("formatted")
    println("########## CANON ##########")
    QueryCompiler.runBoxedCanonical(
      Map("default" -> Shred.shred(li)), join2).explain("formatted")
    spark.stop()
  }
}
