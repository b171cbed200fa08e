package graft.tools

/** Within-run A/B of the query{} execution tiers at DIMENSION scale —
  * the attribution the r15 driver-bench watch item asked for: the
  * EAV-family gates (q_eav_nested 2.73×, q_eav_wildcard 2.09× vs a
  * 1.35× battery-wide host shift) changed execution path in r15
  * (canonical → typed EAV), and no within-run A/B existed at sf0.1/sf1
  * to separate per-row encode overhead from host state.
  *
  * Runs the two flagged gate SHAPES through every applicable tier,
  * interleaved round-robin in ONE JVM (RepeatBench's posture: a slow
  * JVM phase hits every variant equally), with Bench's between-query
  * hygiene. Prints per-iteration lines plus a median summary with
  * typed/canonical ratios.
  *
  *   tools/run_main.sh graft.tools.EavTierAb <sfDir> [iters]
  *
  * Shapes:
  *   nested_*  q_eav_nested's customer-profile chain (4 patterns,
  *             numeric predicate). live = the public runBoxed (r16:
  *             regroup-product tier), typed = forced runBoxedEav,
  *             canon = the canonical-string authority.
  *   wild_*    q_eav_wildcard's [?e ?a _] over the nation shred —
  *             wildcard attr can never leave EAV, so typed vs canon.
  */
object EavTierAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(7)
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import graft.query.QueryCompiler
    import graft.query.QueryCompiler.{C, Pattern, V, W}
    import graft.shred.Shred

    def hygiene(): Unit = {
      graft.core.Caches.releaseAll(spark); System.gc()
    }

    def nestedSrc() = {
      val docs = graft.Tables.customer(spark, sfDir).select(
        col("c_custkey"), col("c_name"),
        struct(col("c_mktsegment"), col("c_acctbal")).as("profile"))
      Map("default" -> Shred.shred(docs, Some("c_custkey")))
    }
    val nestedPats = Seq(
      Pattern(V("c"), C("c_name"), V("name")),
      Pattern(V("c"), C("profile"), V("p")),
      Pattern(V("p"), C("c_mktsegment"), C("BUILDING")),
      Pattern(V("p"), C("c_acctbal"), V("bal")))
    val nestedPred = Seq((b: Map[String, org.apache.spark.sql.Column]) =>
      QueryCompiler.num(b("bal")) > 1000)

    def wildSrc() =
      Map("default" -> Shred.shred(graft.Tables.nation(spark, sfDir),
        Some("n_nationkey")))
    val wildPats = Seq(Pattern(V("e"), V("attr"), W))

    // q_eav_join's shape (round 17): fused = shredAttrsVerified key
    // license (INCLUDING the per-run count-distinct proof, as the
    // driver gate pays it); product = the r16 unproven-id plan;
    // typed = forced EAV. Attributes the driver's r16 1.85× delta.
    val joinPats = Seq(
      Pattern(V("o"), C("o_orderpriority"), C("1-URGENT"), "orders"),
      Pattern(V("o"), C("o_custkey"), V("ck"), "orders"),
      Pattern(V("c"), C("c_custkey"), V("ck"), "customer"),
      Pattern(V("c"), C("c_name"), V("name"), "customer"))
    def joinSrcVerified() = Map(
      "orders" -> Shred.shredAttrsVerified(
        graft.Tables.orders(spark, sfDir), "o_orderkey",
        Seq("o_orderpriority", "o_custkey")),
      "customer" -> Shred.shredAttrsVerified(
        graft.Tables.customer(spark, sfDir), "c_custkey",
        Seq("c_custkey", "c_name")))
    def joinSrcPlain() = Map(
      "orders" -> Shred.shredAttrs(
        graft.Tables.orders(spark, sfDir), Some("o_orderkey"),
        Seq("o_orderpriority", "o_custkey")),
      "customer" -> Shred.shredAttrs(
        graft.Tables.customer(spark, sfDir), Some("c_custkey"),
        Seq("c_custkey", "c_name")))

    // hot = proof paid ONCE at source construction (the production
    // shape: shred verified at write, queried many times); join_fused
    // re-pays both count-distinct proof actions every iteration (the
    // driver gate's posture)
    val joinSrcHot = joinSrcVerified()

    val variants: Seq[(String, () => org.apache.spark.sql.DataFrame)] =
      Seq(
        "join_fused" -> (() => QueryCompiler.runBoxed(
          joinSrcVerified(), joinPats)),
        "join_fused_hot" -> (() => QueryCompiler.runBoxed(
          joinSrcHot, joinPats)),
        "join_product" -> (() => QueryCompiler.runBoxed(
          joinSrcPlain(), joinPats)),
        "join_typed" -> (() => QueryCompiler.runBoxedEav(
          joinSrcPlain(), joinPats)),
        "nested_live" -> (() => QueryCompiler.runBoxed(
          nestedSrc(), nestedPats, nestedPred)),
        "nested_typed" -> (() => QueryCompiler.runBoxedEav(
          nestedSrc(), nestedPats, nestedPred)),
        "nested_canon" -> (() => QueryCompiler.runBoxedCanonical(
          nestedSrc(), nestedPats, nestedPred)),
        "wild_typed" -> (() => QueryCompiler.runBoxedEav(
          wildSrc(), wildPats)),
        "wild_canon" -> (() => QueryCompiler.runBoxedCanonical(
          wildSrc(), wildPats)))

    // warm-up: one pass of everything, unrecorded
    variants.foreach { case (_, mk) =>
      mk().write.mode("overwrite").format("noop").save() }
    hygiene()

    val obs = collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (i <- 1 to iters; (name, mk) <- variants) {
      val t0 = System.nanoTime()
      mk().write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      hygiene()
      obs(name) = obs(name) :+ dt
      println(f"[tierab] iter=$i $name%-14s $dt%8.3f s")
    }
    def med(v: Vector[Double]) = v.sorted.apply(v.size / 2)
    val m = variants.map { case (n, _) => n -> med(obs(n)) }.toMap
    println(f"TIERAB $sfDir iters=$iters " +
      variants.map { case (n, _) => f"$n=${m(n)}%.3f" }.mkString(" "))
    println(f"TIERAB ratios: nested typed/canon=" +
      f"${m("nested_typed") / m("nested_canon")}%.2f " +
      f"live/canon=${m("nested_live") / m("nested_canon")}%.2f " +
      f"wild typed/canon=${m("wild_typed") / m("wild_canon")}%.2f " +
      f"join fused/product=${m("join_fused") / m("join_product")}%.2f " +
      f"hot/product=${m("join_fused_hot") / m("join_product")}%.2f " +
      f"product/typed=${m("join_product") / m("join_typed")}%.2f")
    spark.stop()
  }
}
