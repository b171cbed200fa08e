package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.util.CollationSupport
import org.apache.spark.unsafe.types.UTF8String
import graft.SparkSpec

class TmpIsolateSpec extends SparkSpec {
  test("which lower variant matches Column lower()") {
    import spark.implicits._
    val samples = Seq("ßσü2Σ,", "cΣ2c", "ü2Σ", "aΣ b", "2Σ,", "xΣ")
    val rows = samples.toDF("t")
      .select(col("t"), lower(col("t")).as("colLower")).collect()
    rows.foreach { r =>
      val t = r.getAs[String]("t")
      val u = UTF8String.fromString(t)
      def cp(s: String) = s.codePoints.toArray.map(i => f"$i%04x").mkString(",")
      println(s"IN[${cp(t)}] col=[${cp(r.getAs[String]("colLower"))}] " +
        s"execBinary=[${cp(CollationSupport.Lower.execBinary(u).toString)}] " +
        s"execBinaryICU=[${cp(CollationSupport.Lower.execBinaryICU(u).toString)}] " +
        s"execLowercase=[${cp(CollationSupport.Lower.execLowercase(u).toString)}] " +
        s"u8toLower=[${cp(u.toLowerCase.toString)}]")
    }
  }
}
