package graft.tools

import org.apache.spark.sql.functions._

/** Scale-knob probe for the sf1 rehearsal (VERDICT r8 item 2): reports
  * the distributions that only bite under volume — LSH band-bucket
  * sizes vs the maxBucket cap, exact-dedup group skew, duplicate-graph
  * edge volume, and total shuffle bytes for the deep express cascade —
  * at whatever SF directory it is pointed at.
  *
  * Usage: sbt "runMain graft.tools.ScaleProbe /tmp/graft_sf1"
  */
object ScaleProbe {

  /** Sum of shuffle bytes written while `f` runs (stage-level listener;
    * local mode = one app, so isolate by running queries serially). */
  private def shuffleBytes(
      spark: org.apache.spark.sql.SparkSession)(f: => Unit): Long = {
    val acc = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
          : Unit =
        acc.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics
          .bytesWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    try { f; Thread.sleep(500) } // let the listener bus drain
    finally spark.sparkContext.removeSparkListener(listener)
    acc.get
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = graft.Sessions.local()
    import graft.pipeline.Dedup
    val docs = graft.Tables.documents(spark, d)
      .select(col("doc_id").as("id"), col("text").as("__t"))

    // ---- LSH band-bucket size distribution vs the maxBucket cap
    val sig = Dedup.spread(docs)
      .select(col("id"),
        Dedup.minhashSignature(Dedup.shingles(col("__t"), 3), 64)
          .as("sig"))
    val buckets = sig
      .select(col("id"), explode(Dedup.bands(col("sig"), 16, 4)).as("bb"))
      .groupBy(col("bb.band"), col("bb.bucket"))
      .agg(count(lit(1)).as("n"))
    val st = buckets.agg(
      count(lit(1)).as("n_buckets"), max("n").as("max_sz"),
      expr("percentile_approx(n, 0.99)").as("p99"),
      sum(when(col("n") > 1000, 1)).as("n_over_cap"),
      sum(when(col("n") > 1000, col("n"))).as("rows_dropped")).head()
    println(s"[probe] lsh_buckets n=${st.getLong(0)} max=${st.getLong(1)} " +
      s"p99=${st.get(2)} over_cap(1000)=${st.get(3)} " +
      s"rows_dropped=${st.get(4)}")

    // ---- exact-dedup group skew (the window partition key)
    val g = docs.groupBy(md5(Dedup.normalize(col("__t"))).as("h"))
      .agg(count(lit(1)).as("n"))
      .agg(count(lit(1)), max("n"), expr("percentile_approx(n, 0.999)"))
      .head()
    println(s"[probe] exact_groups n=${g.getLong(0)} max=${g.getLong(1)} " +
      s"p999=${g.get(2)}")

    // ---- duplicate-graph edge volume (drives dupGroups round cost)
    val edges = Dedup.minhashCandidates(docs, "id", "__t")
    println(s"[probe] minhash_candidate_pairs n=${edges.count()}")
    graft.core.Caches.releaseAll(spark)

    // ---- shuffle bytes of the depth-4 express cascade and sessions
    Seq("q_express_deep", "q_sessions", "p_minhash", "p_exact_dedup")
      .foreach { q =>
        val b = shuffleBytes(spark) {
          graft.SparkEntry.queries(q)(spark, d).count()
        }
        graft.core.Caches.releaseAll(spark)
        println(f"[probe] shuffle_bytes $q%-16s ${b / 1024.0 / 1024}%9.2f MiB")
      }
    spark.stop()
  }
}
