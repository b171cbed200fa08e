// Scratch probe: decompose the p_ann_indexed gate row into its two
// stages — index WRITE (corpus encode, linear in the corpus, what the
// gate deliberately includes so it can never consume a stale artifact)
// vs the PROBE (index scan + pigeonhole shortlist + exact re-rank, the
// production per-batch cost). The sf100 attribution row.
//   sbt "runMain graft.tools.AnnIdxProbe /tmp/graft_sf10 [dropcache]"
//
// `dropcache` (root only): sync + drop the OS page cache AFTER the
// index write and query materialization, so `probe_cold` measures the
// out-of-cache probe — the r14 sf100 rows were cache-flattered (the
// whole embeddings corpus fit page cache). probe_warm repeats the
// probe immediately for the delta; the query rows are pre-collected
// so the probe stage never re-scans the corpus for its inputs.
package graft.tools

object AnnIdxProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf10")
    val dropCache = args.contains("dropcache")
    val spark = graft.Sessions.local("32")
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables.embeddings(spark, sfDir)
    val path = "/tmp/graft_annidx_" +
      sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    def t(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"ANNIDX $tag%-10s $sfDir " +
        f"${(System.nanoTime() - t0) / 1e9}%7.1f s")
      graft.core.Caches.releaseAll(spark)
    }
    t("write") {
      graft.pipeline.Indexes.writeBinaryIndex(emb, "vec_id",
        "embedding", path)
    }
    // materialize the 20 query rows up front: the probe stage must
    // not pay (or re-warm) a corpus scan just to read its inputs
    val qRows = emb.orderBy("vec_id").limit(20).collect()
    val queries = spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(qRows: _*)),
      emb.schema)
    def probe(tag: String): Unit = t(tag) {
      graft.pipeline.Indexes.binaryTopKIndexed(queries,
          graft.pipeline.Indexes.openBinaryIndex(spark, path), emb,
          "vec_id", "vec_id", "embedding", k = 5, shortlist = 50)
        .write.mode("overwrite").format("noop").save()
    }
    if (dropCache) {
      val rc = new ProcessBuilder("sh", "-c",
        "sync && echo 3 > /proc/sys/vm/drop_caches").inheritIO()
        .start().waitFor()
      println(s"ANNIDX dropcache rc=$rc")
      probe("probe_cold")
      probe("probe_warm")
    } else probe("probe")
    spark.stop()
  }
}
