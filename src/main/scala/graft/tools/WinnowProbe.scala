// Scratch stage attribution for Dedup.winnowPairs at scale:
//   sbt "runMain graft.tools.WinnowProbe [sfDir]"
// Times (1) the fingerprint frame (kernel + distinct), (2) the skew
// window, (3) the pair self-join + aggregation — each materialized
// via count over a forced-evaluation agg so nothing elides.
package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

object WinnowProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf10")
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    val doc = graft.Tables.documents(spark, sfDir)

    def timed[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[winnowprobe] $what%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val fps = doc.select(col("doc_id").as("id"),
        explode(graft.pipeline.Dedup.winnow(col("text"), 4, 8)).as("f"))
      .select(col("id"), col("f.h").as("h")).distinct()
      .persist()
    val nFps = timed("fingerprints (kernel+distinct)") { fps.count() }
    val capped = fps
      .withColumn("__n", count(lit(1)).over(Window.partitionBy("h")))
      .filter(col("__n") <= 1000).drop("__n")
      .persist()
    val nCap = timed("skew window + filter") { capped.count() }
    val pairs = timed("pair self-join + agg") {
      capped.as("l").join(capped.as("r"),
          col("l.h") === col("r.h") && col("l.id") < col("r.id"))
        .groupBy(col("l.id").as("id1"), col("r.id").as("id2"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 2)
        .agg(count(lit(1)), sum("n_shared")).collect()(0)
    }
    println(s"[winnowprobe] n_fps=$nFps n_capped=$nCap pairs=$pairs")
    spark.stop()
  }
}
