package graft.tools
import org.apache.spark.sql.functions._
/** q_reduce_step sf10 attribution: stage timings for the collect_list
  * grouping, the reduce-step evaluation + explode, and the final
  * presentation sort — which part carries the 18×/decade step?
  */
object ReduceStepProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/tmp/graft_sf10")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
      graft.core.Caches.releaseAll(spark); System.gc()
    }
    val l = graft.Tables.lineitem(spark, d)
    time("warm")(l.count())
    val base = l.groupBy("l_orderkey")
      .agg(collect_list(struct(
        col("l_returnflag").as("flag"),
        col("l_quantity").cast("long").as("qty"))).as("items"))
    time("collect_list grouping only")(base.count())
    val evald = graft.lang.RM.evalCol("items{flag : $sum(qty)}", base,
        keep = Seq("l_orderkey"))
      .select(col("l_orderkey"),
        explode_outer(col("value")).as(Seq("flag", "qty_sum")))
      .filter(col("flag").isNotNull)
    time("grouping + reduce-step + explode")(evald.count())
    time("full gate incl. orderBy")(
      graft.SparkEntry.queries("q_reduce_step")(spark, d).count())
    spark.stop()
  }
}
