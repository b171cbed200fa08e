package graft.tools
import org.apache.spark.sql.functions._
/** Stage-level attribution probe for the decontamination cost at
  * scale: gram-explode volume, distinct/boilerplate gram counts under
  * both caps, the inverted join's raw fan-out, and the full operator
  * — plus the n=8 production-gram contrast (real decontamination uses
  * n ≥ 8, where gram density collapses; the gates use n=3 so they
  * discriminate at sf0.01).
  *
  * Usage: sbt "runMain graft.tools.DecontamProbe [sfDir] [full]"
  */
object DecontamProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/tmp/graft_sf10")
    val doc = graft.Tables.documents(spark, d)
    val train = doc.filter(col("doc_id") % 20 =!= 0)
    val ev = doc.filter(col("doc_id") % 20 === 0)
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
      graft.core.Caches.releaseAll(spark); System.gc()
    }
    def grams(df: org.apache.spark.sql.DataFrame, id: String,
        n: Int) =
      graft.pipeline.Dedup.spread(
          df.select(col(id).as("id"), col("text").as("__t")))
        .select(col("id"),
          explode(graft.functions.ShingleHashes(col("__t"), n)).as("h"))
    time("warm")(doc.count())
    for (n <- Seq(3, 8)) {
      val tr = grams(train, "doc_id", n)
      val te = grams(ev, "doc_id", n)
      time(s"n=$n train gram explode")(tr.count())
      val freq = tr.groupBy("h").agg(count(lit(1)).as("f"))
      time(s"n=$n distinct grams")(freq.count())
      val nTrain = train.count()
      val capRel = math.min(1000L, math.ceil(0.001 * nTrain).toLong)
      time(s"n=$n boiler grams (cap=1000 abs)")(
        freq.filter(col("f") > 1000).count())
      time(s"n=$n boiler grams (cap=$capRel rel)")(
        freq.filter(col("f") > capRel).count())
      for ((tag, cap) <- Seq("abs1000" -> 1000L, s"rel$capRel" -> capRel)) {
        val boiler = freq.filter(col("f") > cap).select("h")
        val kept = tr.join(boiler, Seq("h"), "left_anti")
        time(s"n=$n join fan-out rows ($tag)")(
          te.join(kept, "h").count())
      }
    }
    time("full operator n=3 (relative default)")(
      graft.pipeline.Decontam.contamination(train, "doc_id", ev,
        "doc_id", "text", n = 3, minCommon = 2).count())
    time("full operator n=8 (relative default)")(
      graft.pipeline.Decontam.contamination(train, "doc_id", ev,
        "doc_id", "text", n = 8, minCommon = 2).count())
    if (args.length > 1) {
      time("full operator n=3 (absolute legacy)")(
        graft.pipeline.Decontam.contamination(train, "doc_id", ev,
          "doc_id", "text", n = 3, minCommon = 2,
          maxShingleFrac = 1.0).count())
    }
    spark.stop()
  }
}
