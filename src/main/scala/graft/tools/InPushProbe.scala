// Scratch: measure the parquet IN-pushdown cliff — a scattered
// 1000-id isin fetch over the big embeddings corpus with the default
// inFilterThreshold (degrades to a min/max range filter → full scan)
// vs a raised threshold (exact In → page/row-group pruning via the
// parquet column index).
//   tools/run_main.sh graft.tools.InPushProbe /tmp/graft_ann_big
package graft.tools

import org.apache.spark.sql.functions._

object InPushProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_ann_big")
    val spark = graft.Sessions.local("32")
    spark.sparkContext.setLogLevel("ERROR")
    val ids: Seq[Long] = (0 until 1000).map(i => (i * 19997L) % 20000000L)
    def bytesRead(f: => Unit): Long = {
      val before = spark.sparkContext.statusTracker.getExecutorInfos
      val acc = new java.util.concurrent.atomic.AtomicLong
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit =
          acc.addAndGet(s.stageInfo.taskMetrics.inputMetrics.bytesRead)
      }
      spark.sparkContext.addSparkListener(l)
      try { f; Thread.sleep(500) }
      finally spark.sparkContext.removeSparkListener(l)
      acc.get
    }
    val contiguous: Seq[Long] = (0L until 1000L)
    def run(tag: String, thr: String, f: org.apache.spark.sql.DataFrame
        => org.apache.spark.sql.DataFrame): Unit = {
      spark.conf.set("spark.sql.parquet.pushdown.inFilterThreshold", thr)
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val t0 = System.nanoTime()
      val b = bytesRead {
        f(emb).write.mode("overwrite").format("noop").save()
      }
      println(f"INPUSH $tag%-16s thr=$thr%-5s " +
        f"${(System.nanoTime() - t0) / 1e9}%7.1f s ${b / 1e9}%8.2f GB read")
    }
    run("warm_full_scan", "10", identity)
    run("scattered", "10", _.filter(col("vec_id").isin(ids: _*)))
    run("scattered", "4096", _.filter(col("vec_id").isin(ids: _*)))
    run("contiguous", "4096",
      _.filter(col("vec_id").isin(contiguous: _*)))
    run("range", "4096", _.filter(col("vec_id") >= 0L &&
      col("vec_id") < 1000L))
    spark.stop()
  }
}
