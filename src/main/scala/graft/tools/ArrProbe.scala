package graft.tools

// Scratch probe: the ARRAY-chain profile (r16) — orders documents
// with their lineitems as an array-of-struct attribute, the
// reference's array-shaped nested-document class. Build once
// (materialized to parquet so probe stages never pay the nesting
// shuffle), then compare the regrouped fused plan (one lateral
// posexplode, content-hash ids) against the forced typed-EAV plan
// (per-element sub-entity triples + a self-join per pattern).
//   tools/run_main.sh graft.tools.ArrProbe /tmp/graft_sf10 [stages]
object ArrProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf10")
    val only = args.lift(1).map(_.split(",").toSeq)
    val spark = graft.Sessions.local("32")
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import graft.query.QueryCompiler
    import graft.query.QueryCompiler.{C, Pattern, V}
    import graft.shred.Shred

    val docsPath = "/tmp/graft_arrdocs_" +
      sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    if (!new java.io.File(docsPath).exists()) {
      val t0 = System.nanoTime()
      graft.Tables.lineitem(spark, sfDir)
        .groupBy("l_orderkey")
        .agg(collect_list(struct(col("l_quantity"),
          col("l_extendedprice"))).as("items"))
        .write.mode("overwrite").parquet(docsPath)
      println(f"ARRPROBE build        $sfDir " +
        f"${(System.nanoTime() - t0) / 1e9}%7.1f s")
    }
    val docs = spark.read.parquet(docsPath)

    def shuffleBytes(f: => Unit): Long = {
      val acc = new java.util.concurrent.atomic.AtomicLong
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit =
          acc.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics
            .bytesWritten)
      }
      spark.sparkContext.addSparkListener(l)
      try { f; Thread.sleep(300) }
      finally spark.sparkContext.removeSparkListener(l)
      acc.get
    }
    def timed(tag: String)(mk: () => org.apache.spark.sql.DataFrame)
        : Unit = {
      if (only.exists(!_.exists(tag.contains))) return
      val t0 = System.nanoTime()
      val bytes = shuffleBytes {
        mk().write.mode("overwrite").format("noop").save()
      }
      println(f"ARRPROBE $tag%-12s $sfDir " +
        f"${(System.nanoTime() - t0) / 1e9}%7.1f s " +
        f"shuffle=${bytes / 1e9}%.2fGB")
      graft.core.Caches.releaseAll(spark)
    }

    val pats = Seq(
      Pattern(V("o"), C("l_orderkey"), V("ok")),
      Pattern(V("o"), C("items"), V("it")),
      Pattern(V("it"), C("l_quantity"), V("qty")))
    def unbox(df: org.apache.spark.sql.DataFrame) =
      df.select(df.columns.toSeq.map(c => df(c).getField("v").as(c)): _*)
    timed("arr_regroup")(() => unbox(QueryCompiler.runBoxed(
      Map("default" -> Shred.shred(docs)), pats)))
    timed("arr_typed")(() => unbox(QueryCompiler.runBoxedEav(
      Map("default" -> Shred.shred(docs)), pats)))
    // r17: the PERSISTED key-licensed case — the deployment shape.
    // shredWrite proves l_orderkey unique (it is the groupBy key) and
    // records it in the sidecar, so the round-tripped triple store
    // fuses onto the same lateral-explode plan instead of paying the
    // EAV tier's per-element self-joins (r16's only option for
    // explicit-id artifacts with array attributes). Write outside the
    // timed probe (a one-time ingest cost, like the docs build).
    val triplesPath = docsPath + "_triples"
    if (!new java.io.File(triplesPath).exists()) {
      val t0 = System.nanoTime()
      Shred.shredWrite(spark, docsPath, Some("l_orderkey"), triplesPath)
      println(f"ARRPROBE build_shred  $sfDir " +
        f"${(System.nanoTime() - t0) / 1e9}%7.1f s")
    }
    timed("arr_persist")(() => unbox(QueryCompiler.runBoxed(
      Map("default" -> Shred.openShred(spark, triplesPath)), pats)))
    spark.stop()
  }
}
