// Scratch plan dumper for the optimization-round evidence trail:
// writes `.explain("formatted")` of each named gate to
// plans/r18/<query>_<tag>.txt (the judge checks plan claims against
// these files).
//   sbt "runMain graft.tools.PlanDump before q_eav_join,q_reduce_step [sfDir]"
package graft.tools

import java.nio.file.{Files, Paths}

object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse("before")
    val names: Seq[String] =
      if (args.length < 2 || args(1) == "all")
        graft.SparkEntry.queries.keys.toSeq.sorted
      else args(1).split(",").toSeq
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.local("32")
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get("plans/r18"))
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"plans/r18/${name}_$tag.txt"), txt)
        println(s"PLANDUMP wrote plans/r18/${name}_$tag.txt")
      } catch { case e: Throwable =>
        println(s"PLANDUMP $name FAILED: ${e.getMessage}")
      }
      graft.core.Caches.releaseAll(spark)
    }
    spark.stop()
  }
}
