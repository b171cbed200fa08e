package graft.tools
import org.apache.spark.sql.functions._
object BinProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/tmp/graft_sf1")
    val emb = graft.Tables.embeddings(spark, d)
    val queries = emb.orderBy("vec_id").limit(20)
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
    }
    import graft.pipeline.Ann
    time("warm")(emb.count())
    time("full binaryTopK (1st)")(Ann.binaryTopK(queries, emb, "vec_id",
      "vec_id", "embedding", k = 5, shortlist = 50, dim = 64).count())
    time("full binaryTopK (2nd)")(Ann.binaryTopK(queries, emb, "vec_id",
      "vec_id", "embedding", k = 5, shortlist = 50, dim = 64).count())
    spark.stop()
  }
}
