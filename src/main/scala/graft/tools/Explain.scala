// Scratch plan inspector: sbt "runMain graft.tools.Explain <query> [sfDir]"
package graft.tools


object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q1_agg")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = graft.Sessions.local("8")
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
