package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only: decompose the p_decontam_seen probe. */
object DspStage {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    val doc = graft.Tables.documents(spark, sfDir)
    val train = doc.filter(col("doc_id") % 20 =!= 0)
    def t[A](what: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"[dsp2] $what%-28s ${(System.nanoTime - s) / 1e9}%.2f s")
      r
    }
    doc.count()
    (1 to 2).foreach { _ =>
      t("explode grams only") {
        train.select(col("doc_id"),
            explode(graft.pipeline.Dedup.shingles(col("text"), 3)).as("g"))
          .groupBy("doc_id").agg(count(lit(1))).count()
      }
      t("grams + one md5 fold") {
        train.select(col("doc_id"),
            explode(graft.pipeline.Dedup.shingles(col("text"), 3)).as("g"))
          .select(col("doc_id"),
            conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long").as("h"))
          .groupBy("doc_id").agg(sum("h")).count()
      }
      val seen = graft.pipeline.SeenSet.open(spark, "/tmp/graft_dsp/evalfilter")
      t("full probe") {
        graft.pipeline.Decontam.suspiciousGrams(train, "doc_id",
          "text", seen, n = 3).count()
      }
      graft.core.Caches.releaseAll(spark)
    }
    spark.stop()
  }
}
