package graft.tools

/** One-JVM interleaved A/B of the writePostingsIndex exchange shape
  * (round 18): old = dfs groupBy(token) and the postings
  * repartition(token) each shuffle the posting stream; new = one
  * staged token repartition serves both. Output parity is checked by
  * row counts of both artifacts.
  *
  *   tools/run_main.sh graft.tools.PostingsWriteAb [sfDir] [iters]
  */
object PostingsWriteAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val doc = graft.Tables.documents(spark, sfDir)
    def hygiene(): Unit = {
      graft.core.Caches.releaseAll(spark); System.gc()
    }
    def oldWrite(path: String): Unit = {
      val base = doc.select(col("doc_id"),
          graft.functions.TokenCounts(col("text")).as("tc"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val lens = base.select(col("doc_id"),
          aggregate(col("tc"), lit(0L),
            (acc, t) => acc + t.getField("cnt")).as("dl"))
        lens.agg(count(lit(1)).as("n_docs"),
            (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
          .write.mode("overwrite").parquet(s"$path/stats")
        val postings = base.join(lens, "doc_id")
          .select(col("doc_id"), col("dl"), explode(col("tc")).as("t"))
          .select(col("t.token").as("token"), col("doc_id"),
            col("t.cnt").as("tf"), col("dl"))
        postings.groupBy("token").agg(count(lit(1)).as("df"))
          .write.mode("overwrite").parquet(s"$path/dfs")
        postings.repartition(col("token"))
          .sortWithinPartitions("token", "doc_id")
          .write.mode("overwrite").parquet(s"$path/postings")
      } finally base.unpersist(blocking = false)
    }
    def newWrite(path: String): Unit =
      graft.pipeline.Indexes.writePostingsIndex(doc, "doc_id", "text",
        path)
    oldWrite("/tmp/graft_postings_ab/old")
    newWrite("/tmp/graft_postings_ab/new")
    val o = spark.read.parquet("/tmp/graft_postings_ab/old/postings").count()
    val n = spark.read.parquet("/tmp/graft_postings_ab/new/postings").count()
    val od = spark.read.parquet("/tmp/graft_postings_ab/old/dfs").count()
    val nd = spark.read.parquet("/tmp/graft_postings_ab/new/dfs").count()
    println(s"[postab] postings old=$o new=$n dfs old=$od new=$nd")
    hygiene()
    val obs = collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (i <- 1 to iters; (name, fn) <- Seq(
        "old" -> (() => oldWrite("/tmp/graft_postings_ab/old")),
        "new" -> (() => newWrite("/tmp/graft_postings_ab/new")))) {
      val t0 = System.nanoTime()
      fn()
      val dt = (System.nanoTime() - t0) / 1e9
      hygiene()
      obs(name) = obs(name) :+ dt
      println(f"[postab] iter=$i $name%-3s $dt%7.3f s")
    }
    def med(v: Vector[Double]) = v.sorted.apply(v.size / 2)
    println(f"POSTAB $sfDir old=${med(obs("old"))}%.3f " +
      f"new=${med(obs("new"))}%.3f")
    spark.stop()
  }
}
