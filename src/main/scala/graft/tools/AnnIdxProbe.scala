// Scratch probe: decompose the p_ann_indexed gate row into its two
// stages — index WRITE (corpus encode, linear in the corpus, what the
// gate deliberately includes so it can never consume a stale artifact)
// vs the PROBE (index scan + Hamming shortlist + exact re-rank, the
// production per-batch cost) — and attribute the probe's IO regime:
// join-form re-rank (broadcast shortlist ⋈ FULL corpus scan) vs the
// point-fetch re-rank (pushed `id IN (…)` → row-group pruning).
//   sbt "runMain graft.tools.AnnIdxProbe /tmp/graft_sf10 [dim] [dropcache]"
//
// `dim` (default 64) must match the corpus's vector width (GenScale
// writes 64; GenAnn defaults to 256). `dropcache` (root only): sync +
// drop the OS page cache BEFORE each *_cold measurement, so the probe
// pays real disk IO — the r14 sf100 rows were cache-flattered (the
// whole 0.5 GB embeddings corpus fit page cache). scan_cold is the
// control: one full out-of-cache corpus scan, i.e. what the join-form
// re-rank's corpus side costs at best. The query rows are
// pre-collected so no probe stage re-scans the corpus for its inputs.
package graft.tools

object AnnIdxProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf10")
    val dim = args.lift(1).filter(_.forall(_.isDigit)).map(_.toInt)
      .getOrElse(64)
    val dropCache = args.contains("dropcache")
    val spark = graft.Sessions.local("32")
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables.embeddings(spark, sfDir)
    val path = "/tmp/graft_annidx_" +
      sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    def t(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"ANNIDX $tag%-16s $sfDir " +
        f"${(System.nanoTime() - t0) / 1e9}%7.1f s")
      graft.core.Caches.releaseAll(spark)
    }
    def drop(): Unit = if (dropCache) {
      val rc = new ProcessBuilder("sh", "-c",
        "sync && echo 3 > /proc/sys/vm/drop_caches").inheritIO()
        .start().waitFor()
      println(s"ANNIDX dropcache rc=$rc")
    }
    t("write") {
      graft.pipeline.Indexes.writeBinaryIndex(emb, "vec_id",
        "embedding", path, dim)
    }
    // materialize the 20 query rows up front: the probe stage must
    // not pay (or re-warm) a corpus scan just to read its inputs
    val qRows = emb.orderBy("vec_id").limit(20).collect()
    val queries = spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(qRows: _*)),
      emb.schema)
    def probeJoin(tag: String): Unit = t(tag) {
      graft.pipeline.Indexes.binaryTopKIndexed(queries,
          graft.pipeline.Indexes.openBinaryIndex(spark, path), emb,
          "vec_id", "vec_id", "embedding", k = 5, shortlist = 50,
          dim = dim)
        .write.mode("overwrite").format("noop").save()
    }
    def probePoint(tag: String): Unit = t(tag) {
      graft.pipeline.Indexes.binaryTopKIndexedPoint(queries,
          graft.pipeline.Indexes.openBinaryIndex(spark, path), emb,
          "vec_id", "vec_id", "embedding", k = 5, shortlist = 50,
          dim = dim)
        .write.mode("overwrite").format("noop").save()
    }
    if (dropCache) {
      drop()
      t("scan_cold") {
        emb.write.mode("overwrite").format("noop").save()
      }
      drop()
      probePoint("probe_cold_point")
      probePoint("probe_warm_point")
      drop()
      probeJoin("probe_cold_join")
      probeJoin("probe_warm_join")
    } else { probeJoin("probe_join"); probePoint("probe_point") }
    spark.stop()
  }
}
