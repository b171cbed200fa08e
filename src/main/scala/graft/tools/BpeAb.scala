// A/B for TextFns.bpeTrain's distinct-word rewrite vs the corpus-scan
// witness at scale:
//   sbt "runMain graft.tools.BpeAb [sfDir] [nMerges] [reps]"
// Prints per-rep wall times for both forms. Within-rep run order
// ALTERNATES (odd reps fast-first, even reps slow-first) so neither
// form systematically benefits from the other's warm-up/cache
// spillover. Asserts trajectory equality — the same pin TokenizerSpec
// makes at fixture scale.
package graft.tools

object BpeAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val nMerges = args.lift(1).map(_.toInt).getOrElse(4)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    val doc = graft.Tables.documents(spark, sfDir)

    def timed(f: => Seq[(String, String, Long)])
        : (Double, Seq[(String, String, Long)]) = {
      val t0 = System.nanoTime()
      val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }

    var fastT = List.empty[Double]
    var slowT = List.empty[Double]
    var lastFast: Seq[(String, String, Long)] = Nil
    var lastSlow: Seq[(String, String, Long)] = Nil
    def runFast() = timed(
      graft.pipeline.TextFns.bpeTrain(doc, "text", nMerges))
    def runSlow() = timed(
      graft.pipeline.TextFns.bpeTrainCorpusScan(doc, "text", nMerges))
    (1 to reps).foreach { rep =>
      val ((tf, rf), (ts, rs)) =
        if (rep % 2 == 1) { val f = runFast(); (f, runSlow()) }
        else { val s = runSlow(); (runFast(), s) }
      fastT ::= tf; slowT ::= ts; lastFast = rf; lastSlow = rs
      println(f"[bpeab] rep=$rep fast=$tf%.3f s corpusScan=$ts%.3f s " +
        s"order=${if (rep % 2 == 1) "fast-first" else "slow-first"}")
    }
    require(lastFast == lastSlow,
      s"trajectories diverged: $lastFast vs $lastSlow")
    val fm = fastT.sorted.apply(fastT.size / 2)
    val sm = slowT.sorted.apply(slowT.size / 2)
    println(f"[bpeab] sf=$sfDir merges=$nMerges median " +
      f"fast=$fm%.3f s corpusScan=$sm%.3f s ratio=${sm / fm}%.2f " +
      s"trajectory=${lastFast.map(t => s"${t._1}+${t._2}:${t._3}")
        .mkString(",")}")
    spark.stop()
  }
}
