// A/B for Cluster.semDedup's scale discipline: fixed gate parameters
// (k=8, planes=6 -> 512 blocks) vs blocks scaled with n (constant
// expected rows/block). Usage:
//   sbt "runMain graft.tools.SemScale [sfDir] [targetRowsPerBlock]"
package graft.tools

object SemScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf10")
    val target = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables.embeddings(spark, sfDir)
    val n = emb.count()
    def run(k: Int, planes: Int, label: String): Unit = {
      val t0 = System.nanoTime()
      val out = graft.pipeline.Cluster.semDedup(emb, "vec_id",
        "embedding", k = k, iters = 2, threshold = 0.3,
        planes = planes, planeSeed = 77)
      val dups = out.filter(org.apache.spark.sql.functions
        .col("is_dup")).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[semscale] sf=$sfDir n=$n $label k=$k planes=$planes " +
        f"blocks=${k.toLong << planes} t=$dt%.2f s dups=$dups")
      graft.core.Caches.releaseAll(spark)
    }
    // gate parameterization: blocks fixed at 512 at every SF
    run(8, 6, "fixed")
    // scale discipline: k grows with n so expected rows/block stays
    // ~target (planes held at 6 -- the recall knob stays untouched)
    val kScaled = math.max(8, (n / (target.toLong << 6)).toInt)
    run(kScaled, 6, "scaled")
    spark.stop()
  }
}
