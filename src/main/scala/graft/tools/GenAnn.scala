package graft.tools

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Deterministic BIG embeddings corpus for IO-honest ANN rehearsals
  * (VERDICT r14 item 2): GenScale's sf100 embeddings are 2M × 64-dim
  * ≈ 0.5 GB — the whole corpus sits in page cache and every probe
  * measurement is cache-flattered. This writes `nVec` × `dim` float
  * vectors (same centroid-plus-hash-noise family, seed 42, bit-stable
  * regeneration) CLUSTERED by vec_id (repartitionByRange → each
  * parquet file covers a contiguous id range), the natural layout of
  * an id-keyed embedding delivery and the one that gives the
  * point-fetch re-rank ([[graft.pipeline.Indexes
  * .binaryTopKIndexedPoint]]) its row-group pruning.
  *
  * Usage: sbt "runMain graft.tools.GenAnn /tmp/graft_ann_big 20000000 256"
  *   → ~20 GB parquet at the defaults, enough to evict between probes
  *     with drop_caches and far past any single executor's cache share
  *     at cluster scale.
  */
object GenAnn {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft_ann_big")
    val nVec = args.lift(1).map(_.toLong).getOrElse(20000000L)
    val dim = args.lift(2).map(_.toInt).getOrElse(256)
    val files = args.lift(3).map(_.toInt).getOrElse(256)
    // row-group size (MB): the point-fetch granularity knob. At the
    // parquet default (128 MB) each ~80 MB file is ONE row group, so
    // a scattered-id IN prunes almost nothing; 8 MB groups give the
    // id-clustered layout its intended ~file/10 fetch granularity.
    val blockMb = args.lift(4).map(_.toInt).getOrElse(128)
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    def h(c: org.apache.spark.sql.Column, salt: Int) =
      abs(hash(c, lit(42), lit(salt)).cast("long"))
    // the embedding is a flat array(...) of codegen'd expressions, NOT
    // a transform(sequence(...)) lambda: higher-order functions
    // evaluate interpreted per element, and at nVec × dim = 5B element
    // evals the interpreted form measured ~40× slower than this
    // whole-stage-codegen build. spark.range(0, n, 1, files) is
    // already contiguous in id per partition, so the write lands
    // id-clustered with NO shuffle (repartitionByRange would sample —
    // a full extra compute pass — then move 20 GB).
    val emb = spark.range(0, nVec, 1, files)
      .select(col("id").as("vec_id"),
        (h(col("id"), 5) % 10).cast("int").as("label"))
      .withColumn("embedding", array((0 until dim).map { i =>
        (cos(col("label") * 1.7 + i * 0.3) +
          (abs(hash(col("vec_id"), lit(i), lit(42)).cast("long"))
            % 600 - 300) / lit(1000.0)).cast("float")
      }: _*))
      .select("vec_id", "embedding", "label")
    emb.write.mode(SaveMode.Overwrite)
      .option("parquet.block.size", (blockMb * 1024L * 1024L).toString)
      .parquet(s"$out/embeddings.parquet")
    println(s"[genann] wrote $nVec x $dim to $out " +
      s"($files files, ${blockMb} MB row groups)")
    spark.stop()
  }
}
