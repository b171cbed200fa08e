package graft.tools
import graft.{SparkEntry, Sessions}
object GateCheck {
  def main(args: Array[String]): Unit = {
    val Array(gates, sfDir, outDir) = args
    val spark = Sessions.local()
    gates.split(",").foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      graft.core.Caches.releaseAll(spark)
    }
    val q = (s: String) => "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString } + "\""
    val json = gates.split(",").filter(SparkEntry.oracleSql.contains)
      .map(k => s"${q(k)}: ${q(SparkEntry.oracleSql(k))}").mkString("{", ",", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
