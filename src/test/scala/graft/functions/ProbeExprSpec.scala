package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Proves the Spark-4 Column ⇄ Expression bridge (graftglue.ColumnGlue)
  * works end-to-end: a custom Catalyst Expression evaluated in a plan.
  */
class ProbeExprSpec extends SparkSpec {
  test("custom Expression round-trips through ColumnGlue") {
    import spark.implicits._
    val out = Seq("hello", "graft").toDF("s")
      .select(ProbeExpr.probeReverse(col("s")).as("r"))
      .as[String].collect().toSeq
    assert(out == Seq("olleh", "tfarg"))
  }
}
