// Scratch stage attribution for the p_er gate:
//   sbt "runMain graft.tools.ErProbe [sfDir]"
package graft.tools

import org.apache.spark.sql.functions._

object ErProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[erprobe] $what%-24s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
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
    val nCand = timed("candidates") {
      graft.pipeline.Linkage.candidates(reg, "rid", keys).count()
    }
    val lp = graft.pipeline.Linkage.linkPairs(reg, "rid", "name",
      keys, 1).persist()
    val nLinks = timed("linkPairs (fresh)") { lp.count() }
    timed("dupGroups (staged pairs)") {
      graft.pipeline.Dedup.dupGroups(reg, "rid", lp).count()
    }
    println(s"[erprobe] n_cand=$nCand n_links=$nLinks")
    spark.stop()
  }
}
