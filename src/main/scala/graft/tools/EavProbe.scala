// Scratch probe: the FULL-fact EAV-path profile (VERDICT r14 item 1) —
// query{} shapes that CANNOT take the direct path (entity self-joins
// over an explicit shred; wildcard attribute position) over the whole
// lineitem, typed route (runBoxed) vs the canonical-string authority
// (runBoxedCanonical), with the q1-style scan-agg control in the same
// pass:
//   sbt "runMain graft.tools.EavProbe /tmp/graft_sf1 [n]"
//
// Stages:
//   control     groupBy(l_returnflag).agg(sum qty) — the scan control
//   join2_*     [?e :l_orderkey ?ok][?e :l_quantity ?qty]: entity
//               self-join at triple scale + Datalog distinct (UnshredEav
//               collapses each pattern scan; the JOIN/DISTINCT encoding
//               is what differs between the variants)
//   wild_*      [_ ?a ?v] over a 4-attr pruned shred: wildcard attr —
//               the shape the direct path refuses — distinct over every
//               (attr, value) binding
package graft.tools

import org.apache.spark.sql.DataFrame
import graft.query.QueryCompiler
import graft.query.QueryCompiler.{C, Pattern, V, W}
import graft.shred.Shred

object EavProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val n = args.lift(1).map(_.toInt).getOrElse(1)
    // optional comma-list of stages (substring match); default all
    val only = args.lift(2).map(_.split(",").toSeq)
    val spark = graft.Sessions.local("32")
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val li = graft.Tables.lineitem(spark, sfDir)

    // shuffle bytes written while f runs: the disk-state-independent
    // metric — this host's IO throughput swings ~5x between runs, but
    // bytes-through-the-exchanges is a pure function of the plan
    def shuffleBytes(f: => Unit): Long = {
      val acc = new java.util.concurrent.atomic.AtomicLong
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit =
          acc.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics
            .bytesWritten)
      }
      spark.sparkContext.addSparkListener(l)
      try { f; Thread.sleep(300) }
      finally spark.sparkContext.removeSparkListener(l)
      acc.get
    }

    def timed(tag: String)(mk: () => DataFrame): Unit = {
      if (only.exists(!_.exists(tag.contains))) return
      var bytes = 0L
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        bytes = shuffleBytes {
          mk().write.mode("overwrite").format("noop").save()
        }
        val dt = (System.nanoTime() - t0) / 1e9
        graft.core.Caches.releaseAll(spark)
        dt
      }
      println(f"EAVPROBE $tag%-12s $sfDir " +
        ts.map(t => f"$t%7.1f").mkString(" ") +
        f" shuffle=${bytes / 1e9}%.2fGB")
    }

    timed("control")(() =>
      li.groupBy("l_returnflag").agg(sum("l_quantity")))

    val join2 = Seq(
      Pattern(V("e"), C("l_orderkey"), V("ok")),
      Pattern(V("e"), C("l_quantity"), V("qty")))
    def unbox(df: DataFrame): DataFrame =
      df.select(df.columns.toSeq.map(c => df(c).getField("v").as(c)): _*)
    // the public entry: shred-aware regrouping compiles this over the
    // documents (no triple self-join)
    timed("join2_regroup")(() => unbox(QueryCompiler.runBoxed(
      Map("default" -> Shred.shred(li)), join2)))
    // forced typed-EAV execution (the tier-2 plan the regroup replaces)
    timed("join2_typed")(() => unbox(QueryCompiler.runBoxedEav(
      Map("default" -> Shred.shred(li)), join2)))
    timed("join2_canon")(() => unbox(QueryCompiler.runBoxedCanonical(
      Map("default" -> Shred.shred(li)), join2)))

    // nested-document conjunction (r16): quantity/price under a
    // struct, so the query chains through a ref — the reference's
    // flagship nested shape (query_test.cljc:622-702). Regrouped:
    // content-hash ids license the FUSED chain plan (nested column
    // projections, zero extra exchanges); forced typed-EAV pays one
    // more triple self-join per nesting level.
    val nested = li.select(col("l_orderkey"), col("l_returnflag"),
      struct(col("l_quantity"), col("l_extendedprice")).as("detail"))
    val nestPats = Seq(
      Pattern(V("e"), C("l_orderkey"), V("ok")),
      Pattern(V("e"), C("detail"), V("d")),
      Pattern(V("d"), C("l_quantity"), V("qty")))
    timed("nest_regroup")(() => unbox(QueryCompiler.runBoxed(
      Map("default" -> Shred.shred(nested)), nestPats)))
    timed("nest_typed")(() => unbox(QueryCompiler.runBoxedEav(
      Map("default" -> Shred.shred(nested)), nestPats)))

    // explicit-idCol shred (r16): duplicate ids are possible
    // (l_orderkey repeats per order), so the regroup tier compiles
    // the PER-ENTITY PRODUCT plan — one groupBy(id) exchange with
    // collect_sets + explodes replacing the Datalog distinct exchange
    timed("join2_product")(() => unbox(QueryCompiler.runBoxed(
      Map("default" -> Shred.shred(li, Some("l_orderkey"))), join2)))

    // r17: the fused LICENSE at fact scale — orders has a genuinely
    // unique key, so the same two-pattern shape runs (a) verified:
    // write-time uniqueness proof → fused row-local plan (the proof's
    // count-distinct action is INSIDE the timing — the honest cost of
    // this posture), vs (b) unproven explicit idCol → product plan
    val orders = graft.Tables.orders(spark, sfDir)
    val join2o = Seq(
      Pattern(V("e"), C("o_orderkey"), V("ok")),
      Pattern(V("e"), C("o_totalprice"), V("tp")))
    timed("join2o_verified")(() => unbox(QueryCompiler.runBoxed(
      Map("default" -> Shred.shredVerified(orders, "o_orderkey")),
      join2o)))
    timed("join2o_product")(() => unbox(QueryCompiler.runBoxed(
      Map("default" -> Shred.shred(orders, Some("o_orderkey"))),
      join2o)))

    val pruned = Seq("l_orderkey", "l_quantity", "l_extendedprice",
      "l_returnflag")
    val wild = Seq(Pattern(W, V("a"), V("v")))
    timed("wild_typed")(() => unbox(QueryCompiler.runBoxed(
      Map("default" -> Shred.shredAttrs(li, None, pruned)), wild)))
    timed("wild_canon")(() => unbox(QueryCompiler.runBoxedCanonical(
      Map("default" -> Shred.shredAttrs(li, None, pruned)), wild)))
    spark.stop()
  }
}
