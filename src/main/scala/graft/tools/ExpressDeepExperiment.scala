package graft.tools

import org.apache.spark.sql.functions._
import graft.express.Express
import graft.express.Express._

/** Decide the deep-express aggregate question with data (SURVEY §4
  * item 6 / VERDICT r8 item 5): on a depth-5 SKEWED-key synthetic,
  * compare the shipped groupBy cascade against a single-shuffle
  * tree-merge — the execution shape a custom TypedImperativeAggregate
  * would have (ONE exchange keyed by the root key; the whole subtree
  * of a root key concentrates in one task's buffer, where the nesting
  * is assembled in memory).
  *
  * The stand-in implements that shape as groupBy(root).agg(
  * collect_list(everything)) + an in-memory tree build per group —
  * identical shuffle profile and per-group memory behavior to the
  * aggregate (partial merge cannot compress below one row per distinct
  * leaf path, and the synthetic's leaf paths are unique, the worst and
  * typical case).
  *
  * Usage: sbt "runMain graft.tools.ExpressDeepExperiment 600000 6000000"
  */
object ExpressDeepExperiment {

  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(600000L, 6000000L)
    val spark = graft.Sessions.local()
    import spark.implicits._

    // depth-5 template: owners → regions → sites → racks → devices
    val tmpl = XObj.of(
      KKey("owner", "k1") -> XVar("k1"),
      KLit("regions") -> XArr(XObj.of(
        KKey("region", "k2") -> XVar("k2"),
        KLit("sites") -> XArr(XObj.of(
          KKey("site", "k3") -> XVar("k3"),
          KLit("racks") -> XArr(XObj.of(
            KKey("rack", "k4") -> XVar("k4"),
            KLit("devices") -> XArr(XObj.of(
              KKey("device", "k5") -> XVar("k5"),
              KLit("load") -> XVar("v"))))))))))

    // single-shuffle tree-merge stand-in: everything under one root
    // key lands in one task, nesting assembled driver-free in memory
    val treeMerge = udf((rows: Seq[org.apache.spark.sql.Row]) => {
      val nested = rows.groupBy(_.getString(0)).toSeq.sortBy(_._1)
        .map { case (k2, r2) =>
          (k2, r2.groupBy(_.getString(1)).toSeq.sortBy(_._1).map {
            case (k3, r3) =>
              (k3, r3.groupBy(_.getString(2)).toSeq.sortBy(_._1).map {
                case (k4, r4) =>
                  (k4, r4.map(r => (r.getString(3), r.getDouble(4)))
                    .sortBy(_._1))
              })
          })
        }
      // force full materialization; return a size fingerprint
      nested.map { case (_, l2) => l2.map { case (_, l3) =>
        l3.map(_._2.size).sum }.sum }.sum
    })

    for (n <- sizes) {
      // 90/10 zipf-ish root skew: ~90% of rows under owner "hot"
      val bsets = spark.range(n).select(
        when(col("id") % 10 < 9, "hot")
          .otherwise(concat(lit("o"), (col("id") % 97).cast("string")))
          .as("k1"),
        concat(lit("r"), (col("id") % 13).cast("string")).as("k2"),
        concat(lit("s"), (col("id") % 211).cast("string")).as("k3"),
        concat(lit("k"), (col("id") % 1009).cast("string")).as("k4"),
        concat(lit("d"), col("id").cast("string")).as("k5"),
        (col("id") % 1000 / 10.0).as("v"))

      def time(label: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val rows = f
        val dt = (System.nanoTime() - t0) / 1e9
        graft.core.Caches.releaseAll(spark)
        println(f"[exp] n=$n%8d $label%-12s $dt%8.2f s ($rows rows)")
      }

      time("cascade") {
        Express.reduceBsets(bsets, tmpl).count()
      }
      time("tree-merge") {
        bsets.groupBy("k1")
          .agg(treeMerge(collect_list(
            struct(col("k2"), col("k3"), col("k4"), col("k5"), col("v"))))
            .as("doc"))
          .count()
      }
    }
    spark.stop()
  }
}
