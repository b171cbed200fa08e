// Scratch probe: the all-pairs verified MinHash pair-list VOLUME at a
// given SF — the attribution row for the dup-graph gates' r14 re-gate
// (the pair list is the ~SF^2 object on a shared-vocabulary corpus;
// CC/LPA/triangles are |E|-bounded consumers). Also counts the fixed
// 500-doc probe list the re-gated gates consume.
//   sbt "runMain graft.tools.PairVolume /tmp/graft_sf1"
package graft.tools

import org.apache.spark.sql.functions._

object PairVolume {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = graft.Sessions.local("32")
    spark.sparkContext.setLogLevel("ERROR")
    val doc = graft.Tables.documents(spark, sfDir)
    def timed(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PAIRVOLUME $tag%-10s $sfDir n=$n%d " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
      graft.core.Caches.releaseAll(spark)
    }
    timed("probe500") {
      graft.pipeline.Dedup.incrementalDupPairsMd5(
        doc.filter(col("doc_id") < 500), "doc_id", doc, "doc_id",
        "text", n = 3, k = 32, b = 8, threshold = 0.8).count()
    }
    timed("all_pairs") {
      graft.pipeline.Dedup.minhashDedupPairsMd5(doc, "doc_id", "text",
        n = 3, k = 32, b = 8, threshold = 0.8).count()
    }
    spark.stop()
  }
}
