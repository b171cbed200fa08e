package graft.tools

object Expl {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("32")
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(args(0))(spark, args.lift(1).getOrElse("/root/testdata/sf0.1"))
    println(df.queryExecution.executedPlan.toString.take(6000))
    spark.stop()
  }
}
