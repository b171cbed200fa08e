package graft.tools

import org.apache.spark.sql.functions._

/** Scratch probe: what do join / distinct / filter-equality do with
  * struct keys whose FIELDS are null? Decides the typed-EAV null
  * encoding (must reproduce the legacy boxed semantics exactly).
  */
object StructNullProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()
    import spark.implicits._
    val a = Seq((Some(1), "x"), (None, "x"), (Some(2), "y"))
      .toDF("v", "tag").select(struct(col("v"), col("tag")).as("k"),
        lit("A").as("side"))
    val b = Seq((Some(1), "x"), (None, "x"), (None, "z"))
      .toDF("v", "tag").select(struct(col("v"), col("tag")).as("k"),
        lit("B").as("side"))
    println("== join on struct col (using) ==")
    a.join(b, Seq("k")).show(false)
    println("== join on k === k ==")
    a.join(b, a("k") === b("k")).show(false)
    println("== distinct over struct with null field ==")
    a.select("k").union(b.select("k")).distinct().show(false)
    println("== filter equality struct(null) === struct(null) ==")
    Seq(1).toDF("z").select(
      (struct(lit(null).cast("int"), lit("x")) ===
        struct(lit(null).cast("int"), lit("x"))).as("eq_nullfield"),
      (struct(lit(null).cast("int"), lit("x")) ===
        struct(lit(1).cast("int"), lit("x"))).as("eq_null_vs_1")).show(false)
    println("== ansi? " + spark.conf.get("spark.sql.ansi.enabled"))
    println("== try_cast probes ==")
    Seq("5", "05", " 5", "5.0", "banana", "NaN", "-0").toDF("s")
      .select(col("s"), col("s").try_cast("long").as("l"),
        (col("s").try_cast("long").cast("string") === col("s"))
          .as("round")).show(false)
    spark.stop()
  }
}
