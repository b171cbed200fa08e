package graft.tools

import org.apache.spark.sql.functions._

/** Differential probe: [[graft.shred.Shred.shredGen]] (the generator,
  * production form) vs [[graft.shred.Shred.shredExpr]] (the expression
  * form) on date/timestamp/binary columns — the generator canonizes
  * via the INTERNAL value's toString (days-int, micros-long, JVM
  * array identity) while the expression form uses Cast's rendering.
  */
object ShredCanonDiff {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq(
      (1L, java.sql.Date.valueOf("2020-04-15"),
        java.sql.Timestamp.valueOf("2020-04-15 12:30:45.123"),
        Array[Byte](104, 105))
    ).toDF("id", "d", "ts", "bin")
    def rows(f: org.apache.spark.sql.DataFrame) =
      f.orderBy("a").collect().map(_.toString).toSeq
    val gen = rows(graft.shred.Shred.shredGen(df, Some("id")))
    val expr = rows(graft.shred.Shred.shredExpr(df, Some("id")))
    println("GEN:  " + gen.mkString(" | "))
    println("EXPR: " + expr.mkString(" | "))
    println(if (gen == expr) "MATCH" else "DIVERGE")
    // determinism: two gen runs must agree (binary identity toString
    // would differ per JVM object)
    val gen2 = rows(graft.shred.Shred.shredGen(df, Some("id")))
    println(if (gen == gen2) "GEN-DETERMINISTIC" else "GEN-NONDET")
    spark.stop()
  }
}
