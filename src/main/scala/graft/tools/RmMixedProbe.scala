package graft.tools

/** Stage attribution for q_rm_mixed — the slowest driver gate for
  * three rounds (~1.8 s at sf0.1; round-16 next-round item 6): is the
  * time the query core (join + Datalog distinct), the typed-restore
  * machinery (the runtime type-facts job + the cached second pass), the
  * text-surface compile/bridge, or the gate's final sort?
  *
  * Two measurements in ONE JVM (within-run ratios only — the host's
  * ~5× IO variance makes cross-run seconds meaningless):
  *
  *  1. Per-JOB wall times of the REAL gate (SparkEntry.queries
  *     "q_rm_mixed"), with each job labeled by its trigger callsite
  *     (first stage name) — separates the facts `head()` job from the
  *     final collect/sort job directly.
  *
  *  2. Medians of three variants, interleaved with Bench hygiene:
  *       core    the same conjunction via QueryCompiler.runDocs over
  *               the same sources (content-hash ids, no typed restore,
  *               no text surface) — the query engine floor;
  *       full    the gate program through RM.queryFrame (adds parse +
  *               compile + JSON bridge of the literal + typed restore
  *               incl. the facts job);
  *       sorted  `full` + the gate's orderBy — the driver's number.
  *
  *   tools/run_main.sh graft.tools.RmMixedProbe <sfDir> [iters]
  */
object RmMixedProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(7)
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import graft.query.QueryCompiler
    import graft.query.QueryCompiler.{C, Pattern, V}
    import graft.shred.Shred
    import spark.implicits._

    def hygiene(): Unit = {
      graft.core.Caches.releaseAll(spark); System.gc()
    }

    // ---- 1: per-job breakdown of the real gate ----
    final case class Job(id: Int, ms: Long, site: String)
    val jobs = collection.mutable.ArrayBuffer[Job]()
    val starts = collection.mutable.Map[Int, (Long, String)]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts(js.jobId) =
          (js.time, js.stageInfos.headOption.map(_.name).getOrElse("?"))
      override def onJobEnd(
          je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        starts.remove(je.jobId).foreach { case (t0, site) =>
          jobs += Job(je.jobId, je.time - t0, site)
        }
    }
    val gate = graft.SparkEntry.queries("q_rm_mixed")
    gate(spark, sfDir).write.mode("overwrite").format("noop").save()
    hygiene() // warm-up run unrecorded (codegen + IO cache)
    spark.sparkContext.addSparkListener(listener)
    gate(spark, sfDir).write.mode("overwrite").format("noop").save()
    Thread.sleep(500) // let the async listener bus drain
    spark.sparkContext.removeSparkListener(listener)
    hygiene()
    jobs.sortBy(_.id).foreach(j =>
      println(f"[rmmixed] job=${j.id}%-3d ${j.ms}%6d ms  ${j.site}"))
    println(f"[rmmixed] jobs_total=${jobs.map(_.ms).sum} ms " +
      f"n_jobs=${jobs.size}")

    // ---- 2: variant medians ----
    val segs = Seq(("BUILDING", 1.0d), ("AUTOMOBILE", 2.0d))
      .toDF("seg", "pri")
    def customer() = graft.Tables.customer(spark, sfDir)
    def docSrc(df: org.apache.spark.sql.DataFrame) =
      QueryCompiler.DocSource(
        df.withColumn("__e", Shred.derivedIdLong(df)), "__e",
        idFunctional = true)
    val pats = Seq(
      Pattern(V("c"), C("c_mktsegment"), V("seg"), "c"),
      Pattern(V("c"), C("c_name"), V("name"), "c"),
      Pattern(V("c"), C("c_acctbal"), V("bal"), "c"),
      Pattern(V("x"), C("seg"), V("seg"), "s"),
      Pattern(V("x"), C("pri"), V("pri"), "s"))
    val program =
      """( $segs := [{'seg': 'BUILDING', 'pri': 1},
        |            {'seg': 'AUTOMOBILE', 'pri': 2}];
        |  query(){[$DBc ?c :c_mktsegment ?seg]
        |          [$DBc ?c :c_name ?name]
        |          [$DBc ?c :c_acctbal ?bal]
        |          [$DBs ?x :seg ?seg]
        |          [$DBs ?x :pri ?pri]}($customer, $segs) )""".stripMargin
    val variants: Seq[(String, () => org.apache.spark.sql.DataFrame)] =
      Seq(
        "core" -> (() => QueryCompiler.runDocs(
          Map("c" -> docSrc(customer()), "s" -> docSrc(segs)), pats)),
        "full" -> (() => graft.lang.RM.queryFrame(program, spark,
          Map("customer" -> customer()))),
        "sorted" -> (() => graft.lang.RM.queryFrame(program, spark,
          Map("customer" -> customer())).orderBy("name")))
    variants.foreach { case (_, mk) =>
      mk().write.mode("overwrite").format("noop").save() }
    hygiene()
    val obs = collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (i <- 1 to iters; (name, mk) <- variants) {
      val t0 = System.nanoTime()
      mk().write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      hygiene()
      obs(name) = obs(name) :+ dt
      println(f"[rmmixed] iter=$i $name%-7s $dt%8.3f s")
    }
    def med(v: Vector[Double]) = v.sorted.apply(v.size / 2)
    val m = variants.map { case (n, _) => n -> med(obs(n)) }.toMap
    println(f"RMMIXED $sfDir iters=$iters " +
      variants.map { case (n, _) => f"$n=${m(n)}%.3f" }.mkString(" ") +
      f" restore_overhead=${m("full") - m("core")}%.3f" +
      f" sort_overhead=${m("sorted") - m("full")}%.3f")
    spark.stop()
  }
}
