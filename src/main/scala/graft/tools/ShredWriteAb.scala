package graft.tools

/** One-JVM interleaved A/B of the shredWrite posture (round 18):
  *   old   write, then a second full docs aggregate (fp + id counts),
  *         then a full read-back of the written triples for the fp —
  *         the r17 inherited shape (3 scans total);
  *   new   Shred.shredWrite as shipped — both fps ride the write as
  *         observed metrics + one id-column-only uniqueness aggregate.
  * Prints per-iter seconds and medians; sanity-checks that the two
  * postures compute the SAME sidecar verdict/fingerprints.
  *
  *   tools/run_main.sh graft.tools.ShredWriteAb [sfDir] [iters]
  */
object ShredWriteAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(7)
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val base = "/tmp/graft_shredwrite_ab"
    graft.Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_name"),
        col("c_acctbal"))
      .write.mode("overwrite").parquet(s"$base/docs")

    def hygiene(): Unit = {
      graft.core.Caches.releaseAll(spark); System.gc()
    }
    // the OLD posture, reconstructed: write + full docs agg + re-read
    def oldWrite(): Unit = {
      val docs = spark.read.parquet(s"$base/docs")
      graft.shred.Shred.shred(docs, Some("c_custkey"))
        .write.mode("overwrite").partitionBy("a").parquet(s"$base/t_old")
      val rowJson = to_json(struct(docs.columns.map(col).toSeq: _*))
      val h60 = conv(substring(md5(rowJson), 1, 15), 16, 10)
        .cast("decimal(38,0)")
      val r = docs.withColumn("__h", h60).agg(
        expr("CAST(coalesce(sum(__h),0) % 1152921504606846976 AS BIGINT)"),
        count(col("c_custkey")), count_distinct(col("c_custkey"))).head()
      val trip = graft.shred.Shred.openShred(spark, s"$base/t_old")
      val tj = to_json(struct(trip.columns.map(col).toSeq: _*))
      val th = conv(substring(md5(tj), 1, 15), 16, 10).cast("decimal(38,0)")
      val tFp = trip.select(th.as("__h")).agg(expr(
        "CAST(coalesce(sum(__h),0) % 1152921504606846976 AS BIGINT)"))
        .head().getLong(0)
      println(s"[shredab] old dFp=${r.getLong(0)} " +
        s"unique=${r.getLong(1) == r.getLong(2)} tFp=$tFp")
    }
    def newWrite(): Unit =
      graft.shred.Shred.shredWrite(spark, s"$base/docs",
        Some("c_custkey"), s"$base/t_new")

    oldWrite(); newWrite(); hygiene() // warm-up
    val obs = collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (i <- 1 to iters; (name, fn) <- Seq(
        "old" -> (() => oldWrite()), "new" -> (() => newWrite()))) {
      val t0 = System.nanoTime()
      fn()
      val dt = (System.nanoTime() - t0) / 1e9
      hygiene()
      obs(name) = obs(name) :+ dt
      println(f"[shredab] iter=$i $name%-4s $dt%7.3f s")
    }
    def med(v: Vector[Double]) = v.sorted.apply(v.size / 2)
    println(f"SHREDAB $sfDir iters=$iters old=${med(obs("old"))}%.3f " +
      f"new=${med(obs("new"))}%.3f")
    // sidecar sanity: the new writer's sidecar must audit clean
    println(s"[shredab] audit_new=" +
      graft.shred.Shred.auditPersisted(spark, s"$base/t_new"))
    spark.stop()
  }
}
