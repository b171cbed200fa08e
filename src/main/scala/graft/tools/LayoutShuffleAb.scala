package graft.tools

/** Shuffle-bytes evidence for the edge-layout staging claims (round
  * 18, VERDICT r17 item 8): for each iterative-graph shape (dupGroups'
  * message join on id2, labelProp's neighbor join on b, pagerank's
  * contrib join on src) run the per-round join+aggregate N times over
  * a staged edge cache in (a) arrival layout and (b) repartitioned by
  * the probe key, and record total shuffle READ bytes per round from
  * the stage metrics. The claim under test: with the cache laid out
  * on the join key, the per-round plan re-exchanges only the small
  * rank/label frame, never the edge frame.
  *
  *   tools/run_main.sh graft.tools.LayoutShuffleAb [sfDir] [rounds]
  */
object LayoutShuffleAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    // emulate the corpus-scale plan: at 100 TB neither side of the
    // round join fits a broadcast, so the planner picks SMJ/SHJ and
    // the edge side's layout decides whether it re-exchanges every
    // round. At probe scale the label frame broadcasts and hides
    // exactly that effect (measured: identical shuffle bytes both
    // layouts), so disable broadcast for the measurement only.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    val read = new java.util.concurrent.atomic.AtomicLong()
    val write = new java.util.concurrent.atomic.AtomicLong()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler
            .SparkListenerStageCompleted): Unit = {
        read.addAndGet(
          sc.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead)
        write.addAndGet(
          sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    def measured(what: String)(body: => Unit): Unit = {
      read.set(0); write.set(0)
      val t0 = System.nanoTime()
      body
      Thread.sleep(400) // let the async listener bus drain
      println(f"[layoutab] $what%-34s ${(System.nanoTime() - t0) / 1e9}%7.3f s" +
        f"  shuffle_read=${read.get() / 1024}%8d KiB" +
        f"  write=${write.get() / 1024}%8d KiB")
    }
    def hygiene(): Unit = {
      graft.core.Caches.releaseAll(spark); System.gc()
    }

    // synthetic near-dup-shaped edge list over the sf documents ids:
    // clusters of 4 consecutive ids + sparse long-range bridges
    val ids = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id").cast("long").as("id"))
    val edges = ids.select(col("id").as("id1"),
        (col("id") - col("id") % 4).as("id2"))
      .filter(col("id1") =!= col("id2"))
      .union(ids.filter(col("id") % 97 === 0)
        .select(col("id").as("id1"), (col("id") * 7 % 5000).as("id2"))
        .filter(col("id1") =!= col("id2")))

    // ---- labelProp/dupGroups shape: per-round join probes edges on
    // the message key, then aggregates by the other endpoint ----
    def roundJoin(e: org.apache.spark.sql.DataFrame,
        labels: org.apache.spark.sql.DataFrame): Unit =
      e.join(labels.withColumnRenamed("id", "id2"), "id2")
        .groupBy(col("id1").as("id"))
        .agg(min("label").as("label"))
        .write.mode("overwrite").format("noop").save()

    for ((tag, layout) <- Seq(
        "arrival" -> false, "repartitioned" -> true)) {
      val sym0 = edges.union(
        edges.select(col("id2").as("id1"), col("id1").as("id2")))
        .distinct()
      val sym = graft.core.Caches.stage(
        if (layout) sym0.repartition(col("id2")) else sym0)
      sym.count() // materialize the cache outside the measured rounds
      val labels = graft.core.Checkpoints.cut(
        sym.select(col("id1").as("id")).distinct()
          .withColumn("label", col("id")))
      for (r <- 1 to rounds)
        measured(s"cc/lpa edges[$tag] round$r") { roundJoin(sym, labels) }
      hygiene()
    }

    // ---- pagerank shape: contrib join probes edges on src ----
    val pedges = ids.select((col("id") % 5000).as("src"),
        (col("id") % 9973).as("dst"), lit(1L).as("w"))
      .filter(col("src") =!= col("dst"))
    for ((tag, layout) <- Seq(
        "arrival" -> false, "repartitioned" -> true)) {
      val e0 = pedges.withColumn("out_w",
        sum("w").over(org.apache.spark.sql.expressions.Window
          .partitionBy("src")))
      val e = graft.core.Caches.stage(
        if (layout) e0.repartition(col("src")) else e0)
      e.count()
      val rank = graft.core.Checkpoints.cut(
        e.select(col("src").as("id")).distinct()
          .withColumn("rank", lit(1000000L)))
      for (r <- 1 to rounds)
        measured(s"pagerank edges[$tag] round$r") {
          e.join(rank.withColumnRenamed("id", "src"), "src")
            .select(col("dst"),
              expr("(CAST(rank AS DECIMAL(38,0)) * w) div out_w")
                .as("c"))
            .groupBy("dst").agg(sum("c").as("cs"))
            .write.mode("overwrite").format("noop").save()
        }
      hygiene()
    }
    spark.stop()
  }
}
