// Scratch probe: attribute the p_curate kernel-fusion win (VERDICT r15
// item 3) — the train-side corpus scan's signal extraction measured in
// isolation, fused CurateSignals (one text pass) vs the legacy Column
// composition (qualityScore's four token passes + md5(normalize)), plus
// the full p_curate gate, with the q1-style scan control in the same
// pass:
//   sbt "runMain graft.tools.CurateProbe /tmp/graft_sf10 [n]"
package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

object CurateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf10")
    val n = args.lift(1).map(_.toInt).getOrElse(1)
    val spark = graft.Sessions.local("32")
    spark.sparkContext.setLogLevel("ERROR")
    val doc = graft.Tables.documents(spark, sfDir)

    def timed(tag: String)(mk: () => DataFrame): Unit = {
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        mk().write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.core.Caches.releaseAll(spark)
        dt
      }
      println(f"CURATE $tag%-14s $sfDir " +
        ts.map(t => f"$t%7.1f").mkString(" "))
    }

    timed("control")(() =>
      doc.groupBy("lang").agg(sum("n_chars")))

    // signal extraction alone: quality + dedup key per doc
    val sig = graft.functions.CurateSignals(col("text"))
    timed("signals_fused")(() => doc.select(col("doc_id"),
      sig.getField("quality").as("quality"),
      sig.getField("key").as("k")))
    timed("signals_legacy")(() => doc.select(col("doc_id"),
      graft.pipeline.TextFns.qualityScore(col("text")).as("quality"),
      md5(graft.pipeline.Dedup.normalize(col("text"))).as("k")))

    // the full gate (fused kernel wired in)
    timed("p_curate")(() =>
      graft.queries.PipelineQueries.pCurate(spark, sfDir))
    spark.stop()
  }
}
