package graft.tools

import org.apache.spark.sql.functions._

/** Stage-attribution probe for q_reduce_step (VERDICT r12 item 3):
  * times each prefix of the gate's plan under the full-eval sink so
  * the 71 s sf10 row decomposes into scan / collect_list shuffle /
  * reduce-step map kernel / explode+sort. Answer-size attribution vs
  * plan-cost attribution decides whether there is anything to fix.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/graft_sf10 \
  *          sbt "runMain graft.tools.ReduceStepProbe"
  */
object ReduceStepProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val spark = graft.Sessions.local()
    def noop(df: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    def hygiene(): Unit = {
      graft.core.Caches.releaseAll(spark); System.gc()
    }
    val l = graft.Tables.lineitem(spark, sfDir)
    // warm
    noop(l.limit(1000)); hygiene()

    val scanT = noop(l.select("l_orderkey", "l_returnflag", "l_quantity"))
    hygiene()
    def base = l.groupBy("l_orderkey")
      .agg(collect_list(struct(
        col("l_returnflag").as("flag"),
        col("l_quantity").cast("long").as("qty"))).as("items"))
    val baseT = noop(base); hygiene()
    def mapped = graft.lang.RM.evalCol("items{flag : $sum(qty)}", base,
      keep = Seq("l_orderkey"))
    val mappedT = noop(mapped); hygiene()
    def exploded = mapped
      .select(col("l_orderkey"),
        explode_outer(col("value")).as(Seq("flag", "qty_sum")))
      .filter(col("flag").isNotNull)
    val explodedT = noop(exploded); hygiene()
    val fullT = noop(exploded.orderBy("l_orderkey", "flag")); hygiene()
    val nRows = exploded.count()
    println(s"""{"metric":"reduce_step_probe","sf":"$sfDir",""" +
      s""""scan":${f"$scanT%.2f"},"collect_list":${f"$baseT%.2f"},""" +
      s""""with_map":${f"$mappedT%.2f"},""" +
      s""""with_explode":${f"$explodedT%.2f"},""" +
      s""""full_sorted":${f"$fullT%.2f"},"out_rows":$nRows}""")
    spark.stop()
  }
}
