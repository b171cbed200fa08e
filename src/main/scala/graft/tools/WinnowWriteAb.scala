package graft.tools

/** One-JVM interleaved A/B of the winnow fingerprint-frame shape
  * (round 18): the old global `.distinct()` on the exploded (id, h)
  * pairs vs the per-row `array_distinct` projection (ids are unique
  * per row, so the two are result-identical — asserted first). Times
  * the full writeWinnowIndex-shaped pipeline (range partition + sort
  * + parquet write) for both.
  *
  *   tools/run_main.sh graft.tools.WinnowWriteAb [sfDir] [iters]
  */
object WinnowWriteAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val iters = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val doc = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 2 === 0)
    def oldFrame = doc.select(col("doc_id").as("id"),
        explode(graft.pipeline.Dedup.winnow(col("text"), 4, 8)).as("f"))
      .select(col("id"), col("f.h").as("h")).distinct()
    def newFrame = doc.select(col("doc_id").as("id"),
        explode(array_distinct(transform(
          graft.pipeline.Dedup.winnow(col("text"), 4, 8),
          f => f.getField("h")))).as("h"))
    val a = oldFrame.count(); val b = newFrame.count()
    println(s"[winnowab] rows old=$a new=$b equal=${a == b}")
    def run(df: org.apache.spark.sql.DataFrame, out: String): Unit =
      df.repartitionByRange(col("h")).sortWithinPartitions("h")
        .write.mode("overwrite").parquet(out)
    run(oldFrame, "/tmp/graft_winnow_ab/old")
    run(newFrame, "/tmp/graft_winnow_ab/new")
    val obs = collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (i <- 1 to iters; (name, mk) <- Seq(
        "old" -> (() => oldFrame), "new" -> (() => newFrame))) {
      val t0 = System.nanoTime()
      run(mk(), s"/tmp/graft_winnow_ab/$name")
      val dt = (System.nanoTime() - t0) / 1e9
      obs(name) = obs(name) :+ dt
      println(f"[winnowab] iter=$i $name%-3s $dt%7.3f s")
    }
    def med(v: Vector[Double]) = v.sorted.apply(v.size / 2)
    println(f"WINNOWAB $sfDir old=${med(obs("old"))}%.3f " +
      f"new=${med(obs("new"))}%.3f")
    spark.stop()
  }
}
