package graft.tools

/** Repeat-measurement harness for bench-anomaly attribution: runs the
  * named gate queries N times each, INTERLEAVED (round-robin, not
  * back-to-back) so a slow phase of the JVM hits every query equally,
  * with the same between-queries hygiene as Bench. Prints one line per
  * observation plus a final JSON summary {query: {median, min, max,
  * iters[]}} and writes it to BENCH_REPEAT.json.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_ITERS=7 \
  *          sbt "runMain graft.tools.RepeatBench q_express_reduce ..."
  * SPARK_GRAFT_OUT overrides the output path (default
  * BENCH_REPEAT.json) so scale-rehearsal runs don't clobber the
  * attribution record.
  */
object RepeatBench {

  private def hygiene(spark: org.apache.spark.sql.SparkSession): Unit = {
    graft.core.Caches.releaseAll(spark)
    System.gc()
  }

  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q_express_reduce", "q_express_nested", "q_reduce_step",
      "q_express_deep", "q_express_map_keys")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "7").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = graft.Sessions.local()
    // same warm-up shape as Bench: flagship + micro text-frontend
    try {
      graft.SparkEntry.entry(spark).count()
      graft.lang.RM.queryFrame(
        """( $d := [{'k': 'a', 'n': 1}, {'k': 'b', 'n': 2}];
          |  $bs := query(){[?e :k ?k] [?e :n ?n]}($d);
          |  $reduce($bs, express(){{'k': key(?k), 'n': ?n}}) )"""
          .stripMargin, spark, Map.empty).count()
    } catch { case _: Throwable => () }
    hygiene(spark)
    val obs = collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    // SPARK_GRAFT_FULL=1: evaluate through the noop sink instead of
    // count() — count() can prune final projections AND eliminate
    // left joins onto group-by-unique keys, which for join-assembled
    // gates (p_winnow, p_bloom_seen) elides the whole operator.
    val fullEval = sys.env.get("SPARK_GRAFT_FULL").contains("1")
    for (i <- 1 to iters; n <- names) {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      if (fullEval)
        df.write.mode("overwrite").format("noop").save()
      else df.count()
      val dt = (System.nanoTime() - t0) / 1e9
      hygiene(spark)
      obs(n) = obs(n) :+ dt
      println(f"[repeat] iter=$i $n%-22s $dt%8.3f s")
    }
    def r3(v: Double) = math.round(v * 1000) / 1000.0
    val summary = names.map { n =>
      val v = obs(n).sorted
      val med = if (v.size % 2 == 1) v(v.size / 2)
        else (v(v.size / 2 - 1) + v(v.size / 2)) / 2
      s""""$n":{"median":${r3(med)},"min":${r3(v.head)},""" +
        s""""max":${r3(v.last)},""" +
        s""""iters":[${obs(n).map(r3).mkString(",")}]}"""
    }.mkString("{", ",", "}")
    val line = s"""{"metric":"repeat","sf":"$sfDir","n_iters":$iters,""" +
      s""""queries":$summary}"""
    println(line)
    val out = sys.env.getOrElse("SPARK_GRAFT_OUT", "BENCH_REPEAT.json")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(out), line.getBytes("UTF-8"))
    catch { case _: Throwable => () }
    spark.stop()
  }
}
