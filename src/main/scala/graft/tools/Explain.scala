// Scratch plan inspector: sbt "runMain graft.tools.Explain <query> [sfDir]"
package graft.tools

import org.apache.spark.sql.SparkSession

object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q1_agg")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
