package graft.tools

import graft.{SparkEntry, Sessions}

/** Dev loop: dump a comma-separated subset of SparkEntry.queries to
  * parquet + their oracle SQL, for tools/check_oracle.py — a
  * single-gate Verify so iterating on one operator doesn't pay the
  * full-battery dump. Usage:
  * runMain graft.tools.GateCheck p_l_div /root/testdata/sf0.01 /tmp/out
  */
object GateCheck {
  def main(args: Array[String]): Unit = {
    val Array(gates, sfDir, outDir) = args
    val spark = Sessions.local()
    gates.split(",").foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      graft.core.Caches.releaseAll(spark)
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = gates.split(",").filter(SparkEntry.oracleSql.contains)
      .map(k => s"${q(k)}: ${q(SparkEntry.oracleSql(k))}")
      .mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
