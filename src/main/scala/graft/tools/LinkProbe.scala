// Scratch stage attribution for the rewritten Linkage.linkPairs:
//   sbt "runMain graft.tools.LinkProbe [sfDir]"
package graft.tools

import org.apache.spark.sql.functions._

object LinkProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[linkprobe] $what%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    val words = Seq("zero", "one", "two", "three", "four", "five",
      "six", "seven", "eight", "nine")
    val digits = reverse(lpad(col("ck").cast("string"), 6, "0"))
    val nm = rtrim((0 to 9).foldLeft(digits: org.apache.spark.sql.Column) {
      (acc, dg) => regexp_replace(acc, dg.toString, words(dg) + " ")
    })
    val named = graft.Tables.customer(spark, sfDir)
      .select(col("c_custkey").cast("long").as("ck"))
      .withColumn("nm", nm)
    val reg = named.select((col("ck") * 2).as("rid"),
        col("nm").as("name"))
      .union(named.filter(col("ck") % 3 === 0)
        .select((col("ck") * 2 + 1).as("rid"),
          expr("substring(nm, 1, length(nm) - 1)").as("name")))
      .persist()
    timed("registry") { reg.count() }
    val keys = Seq(substring(col("name"), 1, 20),
      expr("right(name, 10)"))
    val tagged = keys.zipWithIndex.map { case (k, i) =>
      struct(lit(i).as("t"), k.cast("string").as("v"))
    }
    val buckets = reg.select(col("rid").as("id"),
        col("name").as("nm"),
        explode(array(tagged: _*)).as("b"))
      .filter(col("b.v").isNotNull)
      .groupBy(col("b.t").as("t"), col("b.v").as("v"))
      .agg(array_sort(collect_set(struct(col("id"), col("nm"))))
        .as("rs"))
      .filter(size(col("rs")).between(2, 100))
      .persist()
    timed("buckets (agg+sort)") { buckets.count() }
    val nb = buckets.agg(sum(size(col("rs"))), count(lit(1))).head()
    println(s"[linkprobe] bucket rows=${nb.getLong(1)} total ids=${nb.getLong(0)}")
    val pairsNoName = flatten(transform(col("rs"), (x, i) =>
      transform(slice(col("rs"), i + lit(2), size(col("rs"))), y =>
        struct(x.getField("id").as("id1"), y.getField("id").as("id2")))))
    timed("explode ids only") {
      buckets.select(explode(pairsNoName).as("p")).count()
    }
    val pairs = flatten(transform(col("rs"), (x, i) =>
      transform(slice(col("rs"), i + lit(2), size(col("rs"))), y =>
        struct(x.getField("id").as("id1"), y.getField("id").as("id2"),
          x.getField("nm").as("n1"), y.getField("nm").as("n2")))))
    timed("explode with names") {
      buckets.select(explode(pairs).as("p")).count()
    }
    timed("explode+lev") {
      buckets.select(explode(pairs).as("p"))
        .select(col("p.id1"), col("p.id2"),
          levenshtein(col("p.n1"), col("p.n2")).as("dist"))
        .filter(col("dist") <= 1).count()
    }
    timed("full linkPairs") {
      graft.pipeline.Linkage.linkPairs(reg, "rid", "name", keys, 1, 100)
        .count()
    }
    spark.stop()
  }
}
