// Scratch per-query profiler: runs each named query N times in one
// session and prints per-run wall times, separating first-run cost
// (plan + codegen compile + exec) from steady-state exec.
//   sbt "runMain graft.tools.Prof q_rm_mixed,q_reduce_step [sfDir] [n]"
package graft.tools


object Prof {
  def main(args: Array[String]): Unit = {
    val names: Seq[String] =
      if (args.isEmpty || args(0) == "all")
        graft.SparkEntry.queries.keys.toSeq.sorted
      else args(0).split(",").toSeq
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val n = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = graft.Sessions.local("32")
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.entry(spark).count() // warm up IO/codegen stack
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROF $name%-20s " +
        ts.map(t => f"$t%6.3f").mkString(" "))
    }
    spark.stop()
  }
}
