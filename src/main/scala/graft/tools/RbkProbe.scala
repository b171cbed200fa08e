// Scratch probe: the FULL-fact-table text-bridge profile (the
// BENCH_sf10_r13 attribution shape) — query{} over the whole lineitem
// through the direct path, then the $reduceByKey fold. Two stage
// prefixes attribute bridge vs fold:
//   sbt "runMain graft.tools.RbkProbe /tmp/graft_sf1 [n]"
package graft.tools

object RbkProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val n = args.lift(1).map(_.toInt).getOrElse(1)
    val spark = graft.Sessions.local("32")
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.Tables.lineitem(spark, sfDir)
    def timed(tag: String, prog: String): Unit = {
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        graft.lang.RM.queryFrame(prog, spark, Map("li" -> li))
          .write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.core.Caches.releaseAll(spark)
        dt
      }
      println(f"RBKPROBE $tag%-12s $sfDir " +
        ts.map(t => f"$t%7.1f").mkString(" "))
    }
    // stage prefix: the bridge alone (query frame through the noop sink)
    timed("query_only",
      """query(){[?e :l_orderkey ?okey]
        |        [?e :l_quantity ?qty]}($li)""".stripMargin)
    // the full program (bridge + distributed keyed fold)
    timed("full_fold",
      """( $bs := query(){[?e :l_orderkey ?okey]
        |                 [?e :l_quantity ?qty]}($li);
        |  $reduceByKey($bs, 'okey', 'qty',
        |    function($a, $x) { $a + $number($x) }) )""".stripMargin)
    spark.stop()
  }
}
