// A/B the UnshredEav rule on EAV-family gates: same session, flag
// toggled per pass (the rule reads the conf at optimization time).
//   sbt "runMain graft.tools.UnshredAb [sfDir] [n]"
package graft.tools

object UnshredAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val n = args.lift(1).map(_.toInt).getOrElse(5)
    val names = Seq("q_eav_filter", "q_eav_join", "q_eav_nested",
      "q_express_reduce", "q_express_nested", "q_express_deep",
      "q_rm_e2e", "q_rm_mixed")
    val spark = graft.Sessions.local("32")
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.entry(spark).count()
    // ONE timed run per call — the outer loop below interleaves the
    // n samples (a run()-internal loop would execute n runs per
    // sample and discard all but the first)
    def run(name: String, flag: Boolean): Double = {
      spark.conf.set(graft.plans.UnshredEav.FLAG, flag.toString)
      try {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir).count()
        graft.core.Caches.releaseAll(spark)
        (System.nanoTime() - t0) / 1e9
      } finally spark.conf.set(graft.plans.UnshredEav.FLAG, "true")
    }
    def med(ts: Seq[Double]): Double = ts.sorted.apply(ts.size / 2)
    names.foreach { name =>
      // interleave to keep host noise symmetric
      val on = Seq.newBuilder[Double]; val off = Seq.newBuilder[Double]
      (1 to n).foreach { _ =>
        off += run(name, flag = false)
        on += run(name, flag = true)
      }
      val (mOn, mOff) = (med(on.result()), med(off.result()))
      println(f"AB $name%-18s off=$mOff%6.3f on=$mOn%6.3f " +
        f"speedup=${mOff / mOn}%5.2fx")
    }
    spark.stop()
  }
}
