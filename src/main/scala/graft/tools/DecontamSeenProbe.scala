package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only stage attribution for p_decontam_seen: filter write vs
  * probe, timed separately (the gate rebuilds the artifact per call).
  */
object DecontamSeenProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    val doc = graft.Tables.documents(spark, sfDir)
    val path = "/tmp/graft_dsp/evalfilter"
    def t[A](what: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"[dsp] $what%-22s ${(System.nanoTime - s) / 1e9}%.2f s")
      r
    }
    // warm-up
    doc.count()
    (1 to 3).foreach { i =>
      t(s"write iter$i") {
        graft.pipeline.Decontam.writeEvalFilter(
          doc.filter(col("doc_id") % 20 === 0), "text", path,
          n = 3, mBits = 262144, nHashes = 4, nShards = 4)
      }
      t(s"probe iter$i") {
        graft.pipeline.Decontam.suspiciousGrams(
            doc.filter(col("doc_id") % 20 =!= 0), "doc_id", "text",
            graft.pipeline.SeenSet.open(spark, path), n = 3)
          .orderBy("doc_id").count()
      }
      graft.core.Caches.releaseAll(spark)
    }
    spark.stop()
  }
}
