package graft.tools

/** One-JVM interleaved A/B of p_curate's decontamination stage with
  * and without the eval-side Bloom pre-filter (round 18, guide §3.2).
  * Equality of the contaminated-id sets is asserted first.
  *
  *   tools/run_main.sh graft.tools.CurateBloomAb [sfDir] [iters]
  */
object CurateBloomAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val doc = graft.Tables.documents(spark, sfDir)
    val train = doc.filter(col("doc_id") >= 250)
    val evalDocs = doc.filter(col("doc_id") < 250)
    val sig = graft.functions.CurateSignals(col("text"))
    val deduped = train
      .withColumn("quality", sig.getField("quality"))
      .withColumn("__k", sig.getField("key"))
      .filter(col("quality") >= 0.55)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__k")).orderBy("doc_id")))
      .filter(col("__rn") === 1).drop("__rn", "__k")
      .persist()
    deduped.count()
    def run(bloom: Boolean): Long = {
      val c = graft.pipeline.Decontam.contamination(
        deduped, "doc_id", evalDocs, "doc_id", "text",
        n = 3, minCommon = 2, bloomPreFilter = bloom)
      val n = c.count(); n
    }
    val a = run(false); val b = run(true)
    println(s"[curateab] pairs off=$a on=$b equal=${a == b}")
    val obs = collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (i <- 1 to iters; (name, bloom) <- Seq(
        "off" -> false, "on" -> true)) {
      val t0 = System.nanoTime()
      run(bloom)
      val dt = (System.nanoTime() - t0) / 1e9
      obs(name) = obs(name) :+ dt
      println(f"[curateab] iter=$i $name%-3s $dt%7.3f s")
    }
    def med(v: Vector[Double]) = v.sorted.apply(v.size / 2)
    println(f"CURATEAB $sfDir off=${med(obs("off"))}%.3f " +
      f"on=${med(obs("on"))}%.3f")
    spark.stop()
  }
}
