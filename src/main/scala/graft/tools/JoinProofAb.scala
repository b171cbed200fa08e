// Scratch A/B: q_eav_join gate with per-source proofs (old) vs one
// batched proof action (new), interleaved in one JVM.
//   sbt "runMain graft.tools.JoinProofAb [sfDir] [iters]"
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables
import graft.shred.Shred
import graft.query.QueryCompiler
import graft.query.QueryCompiler.{C, Pattern, V}

object JoinProofAb {
  private def runQ(s: SparkSession, orders: DataFrame,
      customer: DataFrame): DataFrame =
    QueryCompiler.run(
      Map("orders" -> orders, "customer" -> customer),
      Seq(
        Pattern(V("o"), C("o_orderpriority"), C("1-URGENT"), "orders"),
        Pattern(V("o"), C("o_custkey"), V("ck"), "orders"),
        Pattern(V("c"), C("c_custkey"), V("ck"), "customer"),
        Pattern(V("c"), C("c_name"), V("name"), "customer")))
      .orderBy("ck", "name")

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    def old(): DataFrame = {
      val o = Shred.shredAttrsVerified(Tables.orders(spark, d),
        "o_orderkey", Seq("o_orderpriority", "o_custkey"))
      val c = Shred.shredAttrsVerified(Tables.customer(spark, d),
        "c_custkey", Seq("c_custkey", "c_name"))
      runQ(spark, o, c)
    }
    def neu(): DataFrame = {
      val Seq(o, c) = Shred.shredAttrsVerifiedAll(Seq(
        (Tables.orders(spark, d), "o_orderkey",
          Seq("o_orderpriority", "o_custkey")),
        (Tables.customer(spark, d), "c_custkey",
          Seq("c_custkey", "c_name"))))
      runQ(spark, o, c)
    }
    def proofOnlyOld(): Unit = {
      Shred.idUnique(Tables.orders(spark, d)
        .select("o_orderkey", "o_orderpriority", "o_custkey"),
        "o_orderkey")
      Shred.idUnique(Tables.customer(spark, d)
        .select("c_custkey", "c_name"), "c_custkey")
    }
    def proofOnlyNew(): Unit = {
      Shred.idUniqueAll(Seq(
        (Tables.orders(spark, d)
          .select("o_orderkey", "o_orderpriority", "o_custkey"),
          "o_orderkey"),
        (Tables.customer(spark, d)
          .select("c_custkey", "c_name"), "c_custkey")))
    }
    old().count() // warm both plan families
    neu().count()
    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val dt = (System.nanoTime() - t0) / 1e9
      graft.core.Caches.releaseAll(spark); System.gc(); dt
    }
    val res = (1 to iters).map { _ =>
      (t(old().write.mode("overwrite").format("noop").save()),
       t(neu().write.mode("overwrite").format("noop").save()),
       t(proofOnlyOld()), t(proofOnlyNew()))
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"[jab] old gate   ${med(res.map(_._1))}%6.3f s  " +
      res.map(_._1).map(x => f"$x%5.3f").mkString(" "))
    println(f"[jab] new gate   ${med(res.map(_._2))}%6.3f s  " +
      res.map(_._2).map(x => f"$x%5.3f").mkString(" "))
    println(f"[jab] old proofs ${med(res.map(_._3))}%6.3f s  " +
      res.map(_._3).map(x => f"$x%5.3f").mkString(" "))
    println(f"[jab] new proof  ${med(res.map(_._4))}%6.3f s  " +
      res.map(_._4).map(x => f"$x%5.3f").mkString(" "))
    spark.stop()
  }
}
