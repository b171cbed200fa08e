package graft.tools

/** One-JVM interleaved A/B of the p_er gate's round-18 changes
  * (registry name synthesis regex→lookup + staged registry) against
  * the r17 form, to separate a real regression from host noise.
  *
  *   tools/run_main.sh graft.tools.ErGateAb [sfDir] [iters]
  */
object ErGateAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    def hygiene(): Unit = {
      graft.core.Caches.releaseAll(spark); System.gc()
    }
    val words = Seq("zero", "one", "two", "three", "four", "five",
      "six", "seven", "eight", "nine")
    val digits = reverse(lpad(col("ck").cast("string"), 6, "0"))

    def gate(lookup: Boolean, staged: Boolean)
        : org.apache.spark.sql.DataFrame = {
      val nm =
        if (lookup) {
          val wordArr = array(words.map(lit): _*)
          array_join(transform(sequence(lit(1), lit(6)), i =>
            element_at(wordArr,
              digits.substr(i, lit(1)).cast("int") + 1)), " ")
        } else
          rtrim((0 to 9).foldLeft(
              digits: org.apache.spark.sql.Column) { (acc, dg) =>
            regexp_replace(acc, dg.toString, words(dg) + " ")
          })
      val named = graft.Tables.customer(spark, sfDir)
        .select(col("c_custkey").cast("long").as("ck"))
        .withColumn("nm", nm)
      val reg0 = named.select((col("ck") * 2).as("rid"),
          col("nm").as("name"))
        .union(named.filter(col("ck") % 3 === 0)
          .select((col("ck") * 2 + 1).as("rid"),
            expr("substring(nm, 1, length(nm) - 1)").as("name")))
      val reg = if (staged) graft.core.Caches.stage(reg0) else reg0
      val keys = Seq(substring(col("name"), 1, 20),
        expr("right(name, 10)"))
      val lp = graft.core.Caches.stage(
        graft.pipeline.Linkage.linkPairs(reg, "rid", "name",
          keys, maxDist = 1, maxBucket = 100))
      val ent = graft.pipeline.Dedup.dupGroups(reg, "rid", lp)
        .withColumnRenamed("comp", "entity")
      val nl = lp.select(col("id1").as("id"))
        .union(lp.select(col("id2")))
        .groupBy("id").agg(count(lit(1)).as("n_links"))
      ent.join(nl, Seq("id"), "left")
        .select(col("id").as("rid"), col("entity"),
          coalesce(col("n_links"), lit(0L)).as("n_links"))
        .orderBy("rid")
    }
    val variants = Seq(
      "r17_regex_unstaged" -> (() => gate(false, false)),
      "r18_lookup_staged" -> (() => gate(true, true)),
      "lookup_unstaged" -> (() => gate(true, false)))
    variants.foreach { case (_, mk) =>
      mk().write.mode("overwrite").format("noop").save(); hygiene() }
    val obs = collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (i <- 1 to iters; (name, mk) <- variants) {
      val t0 = System.nanoTime()
      mk().write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      hygiene()
      obs(name) = obs(name) :+ dt
      println(f"[erab] iter=$i $name%-20s $dt%7.3f s")
    }
    def med(v: Vector[Double]) = v.sorted.apply(v.size / 2)
    println("ERAB " + sfDir + " " + variants.map { case (n, _) =>
      f"$n=${med(obs(n))}%.3f" }.mkString(" "))
    spark.stop()
  }
}
