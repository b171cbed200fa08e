package graft.tools

/** Micro A/B of the p_er registry-name expression (round 18, VERDICT
  * item 7): the 10-deep chained regexp_replace digit-speller vs an
  * array-lookup form (per-char word lookup + array_join). Verifies
  * bit-equality of the two columns first, then times each over the
  * same frame, interleaved.
  *
  *   tools/run_main.sh graft.tools.NmAb [sfDir] [iters]
  */
object NmAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(7)
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val words = Seq("zero", "one", "two", "three", "four", "five",
      "six", "seven", "eight", "nine")
    val digits = reverse(lpad(col("ck").cast("string"), 6, "0"))
    val nmRegex = rtrim(
      (0 to 9).foldLeft(digits: org.apache.spark.sql.Column) {
        (acc, dg) => regexp_replace(acc, dg.toString, words(dg) + " ")
      })
    val wordArr = array(words.map(lit): _*)
    val nmLookup = array_join(
      transform(sequence(lit(1), lit(6)), i =>
        element_at(wordArr, digits.substr(i, lit(1)).cast("int") + 1)),
      " ")
    val base = graft.Tables.customer(spark, sfDir)
      .select(col("c_custkey").cast("long").as("ck"))
    val diff = base.select(nmRegex.as("a"), nmLookup.as("b"))
      .filter(col("a") =!= col("b") ||
        col("a").isNull =!= col("b").isNull).count()
    println(s"[nmab] mismatches=$diff")
    def run(c: org.apache.spark.sql.Column): Unit =
      base.select(c.as("nm")).write.mode("overwrite")
        .format("noop").save()
    run(nmRegex); run(nmLookup)
    val obs = collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (i <- 1 to iters; (name, c) <- Seq(
        "regex" -> nmRegex, "lookup" -> nmLookup)) {
      val t0 = System.nanoTime()
      run(c)
      val dt = (System.nanoTime() - t0) / 1e9
      obs(name) = obs(name) :+ dt
      println(f"[nmab] iter=$i $name%-6s $dt%7.3f s")
    }
    def med(v: Vector[Double]) = v.sorted.apply(v.size / 2)
    println(f"NMAB $sfDir regex=${med(obs("regex"))}%.3f " +
      f"lookup=${med(obs("lookup"))}%.3f")
    spark.stop()
  }
}
