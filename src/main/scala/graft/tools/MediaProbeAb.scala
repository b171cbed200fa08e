package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only A/B: media index probe with literal-In vs semi-join
  * pruning at a batch size where the key list is large.
  */
object MediaProbeAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/tmp/graft_sf1")
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.pipeline.{Indexes, Multimodal}
    val docs = graft.Tables.documents(spark, sfDir)
    val media = docs.select(col("doc_id"),
      Multimodal.packFakeMedia(col("text")).as("media"))
    val cor = media.filter(col("doc_id") % 10 =!= 7)
    val inc = media.filter(col("doc_id") % 10 === 7)
    val root = "/tmp/graft_mpab"
    Indexes.writeMediaIndex(cor, "doc_id", "media", s"$root/media")
    val idx = Indexes.openMediaIndex(spark, s"$root/media")
    def t(what: String)(f: => Long): Unit = {
      val s0 = System.nanoTime(); val n = f
      println(f"[mpab] $what%-14s ${(System.nanoTime - s0) / 1e9}%6.2f s  rows=$n")
      graft.core.Caches.releaseAll(spark)
    }
    val nKeys = inc.count() * 4
    println(s"[mpab] approx batch keys: $nKeys")
    (1 to 2).foreach { _ =>
      t("literal-In") { Indexes.mediaDupPairsIndexed(inc, "doc_id",
        "media", idx).count() }
      t("semi-join") { Indexes.mediaDupPairsIndexed(inc, "doc_id",
        "media", idx, maxProbeKeys = 0).count() }
    }
    spark.stop()
  }
}
