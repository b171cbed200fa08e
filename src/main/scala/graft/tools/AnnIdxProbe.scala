// Scratch probe: decompose the p_ann_indexed gate row into its two
// stages — index WRITE (corpus encode, linear in the corpus, what the
// gate deliberately includes so it can never consume a stale artifact)
// vs the PROBE (index scan + pigeonhole shortlist + exact re-rank, the
// production per-batch cost). The sf100 attribution row.
//   sbt "runMain graft.tools.AnnIdxProbe /tmp/graft_sf10"
package graft.tools

object AnnIdxProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf10")
    val spark = graft.Sessions.local("32")
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables.embeddings(spark, sfDir)
    val path = "/tmp/graft_annidx_" +
      sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    def t(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"ANNIDX $tag%-8s $sfDir " +
        f"${(System.nanoTime() - t0) / 1e9}%7.1f s")
      graft.core.Caches.releaseAll(spark)
    }
    t("write") {
      graft.pipeline.Indexes.writeBinaryIndex(emb, "vec_id",
        "embedding", path)
    }
    val queries = emb.orderBy("vec_id").limit(20)
    t("probe") {
      graft.pipeline.Indexes.binaryTopKIndexed(queries,
          graft.pipeline.Indexes.openBinaryIndex(spark, path), emb,
          "vec_id", "vec_id", "embedding", k = 5, shortlist = 50)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
