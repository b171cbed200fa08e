// Scratch FULL-evaluation profiler: like Prof but through the noop
// sink (count() lets Catalyst prune projection expressions, which is
// exactly what hides projection-heavy cost — see Bench's full pass).
//   sbt "runMain graft.tools.FullProf f_object,p_chunks [sfDir] [n]"
package graft.tools

object FullProf {
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
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.core.Caches.releaseAll(spark)
        dt
      }
      println(f"FULLPROF $name%-20s " +
        ts.map(t => f"$t%6.3f").mkString(" "))
    }
    spark.stop()
  }
}
