// Scratch: time the near-dup pipeline (pairs + components) at a SF.
//   sbt "runMain graft.tools.CCDebug /root/testdata/sf0.1"
package graft.tools

import org.apache.spark.sql.functions._
import graft.Tables
import graft.pipeline.Dedup

object CCDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.local("32")
    spark.sparkContext.setLogLevel("ERROR")
    val doc = Tables.documents(spark, sfDir)
    println(s"docs=${doc.count()}")
    var t0 = System.nanoTime()
    val pairs = Dedup.minhashDedupPairsMd5(doc, "doc_id", "text",
      n = 3, k = 32, b = 8, threshold = 0.8)
    println(s"pairs=${pairs.count()} in ${(System.nanoTime() - t0) / 1e9}s")
    t0 = System.nanoTime()
    val comp = Dedup.dupGroups(doc, "doc_id", pairs)
    println(s"components=${comp.select("comp").distinct().count()} " +
      s"in ${(System.nanoTime() - t0) / 1e9}s")
    spark.stop()
  }
}
