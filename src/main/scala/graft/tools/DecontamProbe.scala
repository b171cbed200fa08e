package graft.tools
import org.apache.spark.sql.functions._
/** sf10 attribution probe for the decontamination fan-out: times the
  * inverted-gram join with the absolute-only cap (which the dense
  * synthetic vocabulary sails under) against the corpus-relative cap.
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
    }
    time("warm")(doc.count())
    time("relative cap frac=0.001")(
      graft.pipeline.Decontam.contamination(train, "doc_id", ev,
        "doc_id", "text", n = 3, minCommon = 2,
        maxShingleFrac = 0.001).count())
    if (args.length > 1) time("absolute cap only (default)")(
      graft.pipeline.Decontam.contamination(train, "doc_id", ev,
        "doc_id", "text", n = 3, minCommon = 2).count())
    spark.stop()
  }
}
