// Scratch per-job attribution for Dedup.dupGroups on the p_er shape:
//   sbt "runMain graft.tools.CcProbe [sfDir]"
package graft.tools

import org.apache.spark.scheduler.{SparkListener,
  SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.functions._

object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val descs = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        starts.put(j.jobId, System.nanoTime())
        descs.put(j.jobId,
          Option(j.properties.getProperty("spark.job.description"))
            .getOrElse(""))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val dt = (System.nanoTime() - starts.get(j.jobId)) / 1e9
        println(f"[ccprobe] job ${j.jobId}%3d ${dt}%7.3f s  ${descs.get(j.jobId)}")
      }
    })
    // p_er's link pairs, staged like the gate does
    val words = Seq("zero", "one", "two", "three", "four", "five",
      "six", "seven", "eight", "nine")
    val digits = reverse(lpad(col("ck").cast("string"), 6, "0"))
    val nm = rtrim((0 to 9).foldLeft(digits: org.apache.spark.sql.Column) {
      (acc, dg) => regexp_replace(acc, dg.toString, words(dg) + " ")
    })
    val named = graft.Tables.customer(spark, sfDir)
      .select(col("c_custkey").cast("long").as("ck"))
      .withColumn("nm", nm)
    val reg = named.select((col("ck") * 2).as("rid"),
        col("nm").as("name"))
      .union(named.filter(col("ck") % 3 === 0)
        .select((col("ck") * 2 + 1).as("rid"),
          expr("substring(nm, 1, length(nm) - 1)").as("name")))
    val keys = Seq(substring(col("name"), 1, 20),
      expr("right(name, 10)"))
    val lp = graft.core.Caches.stage(
      graft.pipeline.Linkage.linkPairs(reg, "rid", "name",
        keys, maxDist = 1, maxBucket = 100))
    spark.sparkContext.setJobDescription("warm: materialize linkPairs")
    println(s"[ccprobe] n_links=${lp.count()}")
    spark.sparkContext.setJobDescription("dupGroups")
    val t0 = System.nanoTime()
    val n = graft.pipeline.Dedup.dupGroups(reg, "rid", lp).count()
    println(f"[ccprobe] dupGroups total ${(System.nanoTime() - t0) / 1e9}%7.3f s rows=$n")
    spark.stop()
  }
}
