package graft.tools

import org.apache.spark.sql.functions._

/** Probe-vs-recompute latency for the persisted retrieval indexes.
  *
  * The p_*_indexed GATES deliberately include the index WRITE inside
  * the gate (write → open → probe, so a gate can never consume a
  * stale artifact) — which makes their bench rows measure index
  * CONSTRUCTION, not the query path the artifact exists to serve.
  * This tool measures the production shape: build each artifact ONCE
  * (untimed), then run the probe N times against the open index and
  * the recompute twin N times for contrast, reporting medians.
  * The gap between the two columns is what "precomputed at write
  * time" buys per query batch — the number that scales with corpus
  * size while the probe stays shortlist-bound.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_ITERS=5 \
  *          sbt "runMain graft.tools.IndexProbeBench"
  * Writes BENCH_PROBE.json (override with SPARK_GRAFT_OUT).
  */
object IndexProbeBench {

  private def hygiene(spark: org.apache.spark.sql.SparkSession): Unit = {
    graft.core.Caches.releaseAll(spark)
    System.gc()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "5").toInt
    val root = "/tmp/graft_idx_probe_" +
      sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val spark = graft.Sessions.local()
    import graft.pipeline.{Ann, Dedup, Indexes, Multimodal, TextFns}
    import graft.Tables

    val emb = Tables.embeddings(spark, sfDir)
    val docs = Tables.documents(spark, sfDir)
    val queries = emb.orderBy("vec_id").limit(20)
    val qTerms = {
      import spark.implicits._
      Seq((0L, Seq("customer", "the")), (1L, Seq("order", "part")),
        (2L, Seq("supplier", "region", "nation")))
        .toDF("query_id", "terms")
    }
    val inc = docs.filter(col("doc_id") % 10 === 7)
    val cor = docs.filter(col("doc_id") % 10 =!= 7)

    // ---- build every artifact once, untimed ----
    Indexes.writeBinaryIndex(emb, "vec_id", "embedding",
      s"$root/binary")
    Indexes.writeIvfPqIndex(emb, "vec_id", "embedding",
      s"$root/ivfpq")
    Indexes.writePostingsIndex(docs, "doc_id", "text",
      s"$root/postings")
    Indexes.writeMinhashIndex(cor, "doc_id", "text", s"$root/mh")
    val resBooks = Ann.pqBooks(8, 16, 8, 9090)
    Indexes.writeIvfPqResIndex(emb, "vec_id", "embedding",
      s"$root/ivfpqres", resBooks)
    val media = docs.select(col("doc_id"),
      Multimodal.packFakeMedia(col("text")).as("media"))
    val mediaCor = media.filter(col("doc_id") % 10 =!= 7)
    val mediaInc = media.filter(col("doc_id") % 10 === 7)
    Indexes.writeMediaIndex(mediaCor, "doc_id", "media",
      s"$root/media")
    hygiene(spark)

    // (name, probe thunk, recompute thunk) — each thunk fully
    // evaluates its frame through count()
    val cases: Seq[(String, () => Long, () => Long)] = Seq(
      ("ann_binary",
        () => Indexes.binaryTopKIndexed(queries,
          Indexes.openBinaryIndex(spark, s"$root/binary"), emb,
          "vec_id", "vec_id", "embedding", k = 5).count(),
        () => Ann.binaryTopK(queries, emb, "vec_id", "vec_id",
          "embedding", k = 5).count()),
      ("ann_ivfpq",
        () => Indexes.ivfPqTopKIndexed(queries,
          Indexes.openIvfPqIndex(spark, s"$root/ivfpq"), "vec_id",
          "embedding", k = 5).count(),
        () => Ann.ivfPqTopK(queries, emb, "vec_id", "vec_id",
          "embedding", k = 5).count()),
      ("bm25",
        () => Indexes.bm25QueriesIndexed(spark, s"$root/postings",
          qTerms, "query_id", "terms", topK = 10,
          logIdf = false).count(),
        () => TextFns.bm25Queries(docs, "doc_id", "text", qTerms,
          "query_id", "terms", topK = 10, logIdf = false).count()),
      ("minhash_incr",
        () => Indexes.incrementalDupPairsIndexed(inc, "doc_id",
          Indexes.openMinhashIndex(spark, s"$root/mh"), cor,
          "doc_id", "text").count(),
        () => Dedup.incrementalDupPairsMd5(inc, "doc_id", cor,
          "doc_id", "text").count()),
      ("ann_ivfpq_res",
        () => Indexes.ivfPqResTopKIndexed(queries,
          Indexes.openIvfPqIndex(spark, s"$root/ivfpqres"), "vec_id",
          "embedding", k = 5, books = resBooks).count(),
        () => Ann.ivfPqResidualTopK(queries, emb, "vec_id", "vec_id",
          "embedding", k = 5, books = resBooks, nCentroids = 16,
          nprobe = 4, dim = 64, seed = 4242).count()),
      ("media_dhash",
        () => Indexes.mediaDupPairsIndexed(mediaInc, "doc_id",
          "media", Indexes.openMediaIndex(spark, s"$root/media"))
          .count(),
        // recompute contrast: the self-join pair topology restricted
        // to cross pairs (both sides hash at query time)
        () => Multimodal.imageDupPairs(media, "doc_id", "media")
          .filter((col("id1") % 10 === 7) =!= (col("id2") % 10 === 7))
          .count()))

    def time(f: () => Long): Double = {
      val t0 = System.nanoTime()
      f()
      val dt = (System.nanoTime() - t0) / 1e9
      hygiene(spark)
      dt
    }
    def median(v: Seq[Double]): Double = {
      val s = v.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    def r3(v: Double) = math.round(v * 1000) / 1000.0

    // interleaved: probe/recompute alternate so a slow JVM phase
    // hits both columns equally (RepeatBench discipline)
    val obs = collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (i <- 1 to iters; (name, probe, recompute) <- cases) {
      val tp = time(probe)
      val tr = time(recompute)
      obs(s"$name.probe") = obs(s"$name.probe") :+ tp
      obs(s"$name.recompute") = obs(s"$name.recompute") :+ tr
      println(f"[probe] iter=$i $name%-14s probe=$tp%7.3f s  " +
        f"recompute=$tr%7.3f s")
    }
    val summary = cases.map { case (name, _, _) =>
      val p = median(obs(s"$name.probe"))
      val r = median(obs(s"$name.recompute"))
      s""""$name":{"probe":${r3(p)},"recompute":${r3(r)},""" +
        s""""speedup":${r3(r / math.max(p, 1e-9))}}"""
    }.mkString("{", ",", "}")
    val line = s"""{"metric":"index_probe","sf":"$sfDir",""" +
      s""""n_iters":$iters,"cases":$summary}"""
    println(line)
    val out = sys.env.getOrElse("SPARK_GRAFT_OUT", "BENCH_PROBE.json")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(out), line.getBytes("UTF-8"))
    catch { case _: Throwable => () }
    spark.stop()
  }
}
