package graft.tools
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("8")
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"SMOKE entry rows=$n (>0: ${n > 0})")
    println(s"SMOKE queries=${graft.SparkEntry.queries.size} " +
      s"oracles=${graft.SparkEntry.oracleSql.size}")
    // every query must at least plan at sf0.001
    val bad = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, "/root/testdata/sf0.001").count(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    println(s"SMOKE failures=${bad.size}")
    bad.foreach(println)
    spark.stop()
  }
}
