package graft.pipeline

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Round-8 operators: mergeable histogram quantiles, the column
  * profiler, and fixed-point PageRank.
  */
class SketchGraphSpec extends SparkSpec {

  test("histogram sketch is additive: sharded merge == unsharded build") {
    val ev = Tables.events(spark, sf("sf0.001"))
    val merged = HistSketch.merge(HistSketch.buildSharded(
      ev, "event_type", "value", col("event_id") % 8, 25.0))
    val single = HistSketch.build(ev, "event_type", "value", 25.0)
      .withColumnRenamed("cnt", "cnt1")
    val joined = merged.join(single, Seq("key", "bin"), "full")
    assert(joined.filter(col("cnt").isNull || col("cnt1").isNull ||
      col("cnt") =!= col("cnt1")).count() == 0)
  }

  test("histogram quantile estimate within one bin width of exact") {
    val ev = Tables.events(spark, sf("sf0.001"))
    val est = HistSketch.quantiles(
      HistSketch.build(ev, "event_type", "value", 25.0),
      Seq("est_p50" -> 0.5, "est_p90" -> 0.9), 25.0)
    val ex = ev.select(col("event_type").as("key"), col("value"))
      .groupBy("key")
      .agg(expr("percentile(value, 0.5)").as("x50"),
        expr("percentile(value, 0.9)").as("x90"))
    val j = est.join(ex, "key").collect()
    assert(j.nonEmpty)
    j.foreach { r =>
      val (e50, e90) = (r.getAs[Double]("est_p50"), r.getAs[Double]("est_p90"))
      val (x50, x90) = (r.getAs[Double]("x50"), r.getAs[Double]("x90"))
      assert(e50 >= x50 - 25.0 && e50 <= x50 + 25.0,
        s"p50 $e50 vs exact $x50")
      assert(e90 >= x90 - 25.0 && e90 <= x90 + 25.0,
        s"p90 $e90 vs exact $x90")
    }
  }

  test("histogram drops nulls: quantiles are over the non-null population") {
    import spark.implicits._
    val df = Seq(("k", Some(100.0)), ("k", None), ("k", Some(100.0)))
      .toDF("key", "value")
    val est = HistSketch.quantiles(
      HistSketch.build(df, "key", "value", 25.0),
      Seq("e50" -> 0.5), 25.0).collect().head
    assert(est.getAs[Long]("n") == 2)
    assert(est.getAs[Double]("e50") == 125.0) // bin 4 upper edge, not 25.0
  }

  test("profile computes counts, min/max, and modal value") {
    import spark.implicits._
    val df = Seq(
      (1L, "a"), (2L, "b"), (3L, "b"), (4L, null.asInstanceOf[String]))
      .toDF("k", "s")
    val p = Profile.profile(df, Seq("k", "s"))
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    val k = p("k")
    assert(k.getAs[Long]("n") == 4 && k.getAs[Long]("n_null") == 0)
    assert(k.getAs[Long]("n_distinct") == 4)
    assert(k.getAs[Long]("min_n") == 1 && k.getAs[Long]("max_n") == 4)
    assert(k.getAs[String]("top1") == "1") // all cnt=1, smallest string
    val s = p("s")
    assert(s.getAs[Long]("n") == 4 && s.getAs[Long]("n_null") == 1)
    assert(s.getAs[Long]("n_distinct") == 2)
    assert(s.getAs[Long]("min_n") == -1L) // non-numeric sentinel
    assert(s.getAs[String]("min_s") == "a" && s.getAs[String]("max_s") == "b")
    assert(s.getAs[String]("top1") == "b" && s.getAs[Long]("top1_cnt") == 2)
  }

  test("histogram estimate brackets the exact order statistic " +
      "(randomized widths/data)") {
    import spark.implicits._
    val rng = new scala.util.Random(2026)
    for (wid <- Seq(10.0, 25.0, 100.0); trial <- 1 to 2) {
      val n = 50 + rng.nextInt(150)
      val vals = Seq.fill(n)(rng.nextDouble() * 500)
      val df = vals.map(("k", _)).toDF("key", "value")
      val est = HistSketch.quantiles(
          HistSketch.build(df, "key", "value", wid),
          Seq("e25" -> 0.25, "e50" -> 0.5, "e99" -> 0.99), wid)
        .collect().head
      val sorted = vals.sorted
      for ((nm, q) <- Seq("e25" -> 0.25, "e50" -> 0.5, "e99" -> 0.99)) {
        val exact = sorted(math.ceil(q * n).toInt - 1)
        val e = est.getAs[Double](nm)
        assert(e > exact && e <= exact + wid,
          s"width $wid trial $trial $nm: est $e exact $exact")
      }
    }
  }

  test("heavy hitters: truly frequent tokens survive, est >= exact") {
    import spark.implicits._
    val doc = graft.Tables.documents(spark, sf("sf0.001"))
    val hh = CountMin.heavyHitters(doc, "text", col("doc_id") % 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    graft.core.Caches.releaseAll(spark)
    val exact = doc.select(explode(
        graft.functions.TokenCounts(col("text"))).as("tc"))
      .groupBy(col("tc.token")).agg(sum(col("tc.cnt")).as("c"))
      .orderBy(col("c").desc, col("tc.token"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    // the exact top-10 are unambiguously heavy: all must be returned
    exact.take(10).foreach { case (t, c) =>
      assert(hh.contains(t), s"top token $t missing from heavy hitters")
      assert(hh(t) >= c, s"CMS estimate ${hh(t)} < exact $c for $t")
    }
  }

  test("checks count violations, not just pass/fail") {
    import spark.implicits._
    import Checks._
    val df = Seq(
      (1L, "ok", 5.0), (1L, "ok", 50.0), (2L, null, 500.0))
      .toDF("id", "s", "v")
    val r = Checks.run(df, Seq(
        MinRows(10), NotNull("s"), Unique("id"), InRange("v", 0, 100),
        Matches("s", "^ok$")))
      .collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getBoolean(2))).toMap
    assert(r("min_rows_10") == (3L, false))
    assert(r("not_null_s") == (1L, false))
    assert(r("unique_id") == (1L, false)) // 3 non-null ids, 2 distinct
    assert(r("in_range_v_0_100") == (1L, false))
    assert(r("matches_s") == (0L, true)) // nulls don't count as mismatch
    // parameters disambiguate same-shape checks; true collisions error
    val two = Checks.run(df, Seq(MinRows(1), MinRows(10),
        InRange("v", 0, 100), InRange("v", 0, 1000)))
      .collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getBoolean(2))).toMap
    assert(two("min_rows_1") == (3L, true))
    assert(two("in_range_v_0_1000") == (0L, true))
    intercept[IllegalArgumentException] {
      Checks.run(df, Seq(Matches("s", "a"), Matches("s", "b")))
    }
  }

  test("manifest is partition/order independent and change sensitive") {
    import spark.implicits._
    val docs = (1L to 100L).map(i => (i, s"content of doc $i"))
      .toDF("doc_id", "text")
    val m1 = Sampling.shardManifest(docs, "doc_id", "text", 4)
      .collect().map(r => r.getLong(0) -> r).toMap
    val m2 = Sampling.shardManifest(
        docs.repartition(7).orderBy(col("doc_id").desc),
        "doc_id", "text", 4)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(m1.keySet == m2.keySet)
    m1.keySet.foreach { s =>
      assert(m1(s).getLong(3) == m2(s).getLong(3) &&
        m1(s).getLong(1) == m2(s).getLong(1), s"shard $s diverged")
    }
    // one edited row flips exactly its shard's fingerprint
    val edited = docs.withColumn("text",
      when(col("doc_id") === 42L, lit("tampered")).otherwise(col("text")))
    val m3 = Sampling.shardManifest(edited, "doc_id", "text", 4)
      .collect().map(r => r.getLong(0) -> r).toMap
    val changed = m1.keySet.filter(s => m1(s).getLong(3) != m3(s).getLong(3))
    assert(changed.size == 1, s"expected one changed shard, got $changed")
  }

  test("manifestDiff certifies equal deliveries and localizes tampering") {
    import spark.implicits._
    val docs = (1L to 60L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val m1 = Sampling.shardManifest(docs, "doc_id", "text", 4)
    val same = Sampling.manifestDiff(m1,
      Sampling.shardManifest(docs.repartition(3), "doc_id", "text", 4))
    assert(same.filter(!col("ok")).count() == 0)
    val tampered = docs.filter(col("doc_id") =!= 30L) // drop one row
    val diff = Sampling.manifestDiff(m1,
      Sampling.shardManifest(tampered, "doc_id", "text", 4))
    assert(diff.filter(!col("ok")).count() == 1)
  }

  test("drift: identical halves score 0, disjoint supports score 2") {
    import spark.implicits._
    val a = Seq("x", "x", "y").toDF("c")
    val same = Drift.l1Drift(a, a, Seq("c")).collect().head
    assert(same.getAs[Double]("l1") == 0.0 && !same.getAs[Boolean]("drifted"))
    val b = Seq("z", "z", "w").toDF("c")
    val disj = Drift.l1Drift(a, b, Seq("c")).collect().head
    assert(disj.getAs[Double]("l1") == 2.0 && disj.getAs[Boolean]("drifted"))
    // hand-computed asymmetric case: ref {x:2,y:1} cur {x:1,y:2}
    val c = Seq("x", "y", "y").toDF("c")
    val mid = Drift.l1Drift(a, c, Seq("c")).collect().head
    // |2*3-1*3| + |1*3-2*3| = 6 over 9 = 2/3
    assert(math.abs(mid.getAs[Double]("l1") - 2.0 / 3) < 1e-15)
  }

  test("drift: NULL value group matches across sides in both entry points") {
    import spark.implicits._
    // ref {x:1, NULL:2} vs cur {x:2, NULL:1}: both sides carry a NULL
    // group; l1FromCounts must treat it as ONE value like l1Drift's
    // groupBy does (a plain equi-join would split it into two rows)
    val ref = Seq(Some("x"), None, None).toDF("c")
    val cur = Seq(Some("x"), Some("x"), None).toDF("c")
    val direct = Drift.l1Drift(ref, cur, Seq("c")).collect().head
    val viaCounts = Drift.l1FromCounts(
      Drift.valueCounts(ref, Seq("c")),
      Drift.valueCounts(cur, Seq("c"))).collect().head
    // |1*3-2*3| + |2*3-1*3| = 6 over 9 = 2/3
    assert(math.abs(direct.getAs[Double]("l1") - 2.0 / 3) < 1e-15)
    assert(viaCounts.getAs[Double]("l1") == direct.getAs[Double]("l1"))
    assert(viaCounts.getAs[Long]("n_ref") == 3L &&
      viaCounts.getAs[Long]("n_cur") == 3L)
  }

  test("pagerank: uniform cycle stays uniform; sink-heavy graph ranks it") {
    import spark.implicits._
    // 3-cycle with equal weights: ranks stay at scale/3 every pass
    val cycle = Seq((0L, 1L, 1L), (1L, 2L, 1L), (2L, 0L, 1L))
      .toDF("src", "dst", "w")
    val scale = 1000000000000L
    val r = LinkGraph.pagerank(cycle, iters = 3, scale = scale)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    graft.core.Caches.releaseAll(spark)
    val third = scale / 3
    val expected = (scale / 100 * 15) / 3 + (85L * third) / 100
    assert(r.values.toSet == Set(expected),
      s"cycle ranks $r, expected uniform $expected")
    // star: everyone points at node 0 — it must outrank the leaves
    val star = Seq((1L, 0L, 1L), (2L, 0L, 1L), (3L, 0L, 1L))
      .toDF("src", "dst", "w")
    val s = LinkGraph.pagerank(star, iters = 2, scale = scale)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    graft.core.Caches.releaseAll(spark)
    assert(s(0L) > s(1L) && s(1L) == s(2L) && s(2L) == s(3L))
  }

  test("pagerank oracle identity: contribution floor-division is exact") {
    import spark.implicits._
    // weighted fan: 0 -> 1 (w=2), 0 -> 2 (w=1): contributions split 2:1
    val fan = Seq((0L, 1L, 2L), (0L, 2L, 1L)).toDF("src", "dst", "w")
    val scale = 1000000000000L
    val r = LinkGraph.pagerank(fan, iters = 1, scale = scale)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    graft.core.Caches.releaseAll(spark)
    val init = scale / 3
    val base = (scale / 100 * 15) / 3
    assert(r(1L) == base + 85L * (init * 2 / 3) / 100)
    assert(r(2L) == base + 85L * (init * 1 / 3) / 100)
    assert(r(0L) == base) // dangling source receives nothing
  }

  test("triangles: K4 plus a pendant chain, any edge orientation") {
    import spark.implicits._
    // K4 on 1..4 (4 triangles, each node in 3), pendant 5 attached to
    // 4 (no triangle), chain 5-6; edges deliberately mis-oriented and
    // duplicated to exercise normalization, plus a self-loop
    val edges = Seq((2L, 1L), (1L, 3L), (1L, 4L), (3L, 2L), (2L, 4L),
      (3L, 4L), (4L, 3L), (5L, 4L), (6L, 5L), (6L, 6L))
      .toDF("id1", "id2")
    val got = graft.pipeline.LinkGraph.triangles(edges)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    (1L to 3L).foreach(i => assert(got(i) == ((3L, 3L)), got.toString))
    assert(got(4L) == ((4L, 3L))) // degree 4 (K4 + pendant), 3 triangles
    assert(got(5L) == ((2L, 0L)) && got(6L) == ((1L, 0L)))
    // total triangle credit = 3 x 4 distinct triangles
    assert(got.values.map(_._2).sum == 12L)
  }

  test("labelProp: disjoint triangles converge to per-component " +
      "min labels in 3 synchronous rounds") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 12L), (12L, 10L), (9L, 9L))
      .toDF("id1", "id2")
    val got = graft.pipeline.LinkGraph.labelProp(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.core.Caches.releaseAll(spark)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L),
      s"self-loop node must be dropped, components split: $got")
  }

  test("labelProp: tie between neighbor labels breaks to the " +
      "smaller label") {
    import spark.implicits._
    // path 5-1-7: node 1 sees labels {5, 7}, each once → adopts 5
    val edges = Seq((5L, 1L), (1L, 7L)).toDF("id1", "id2")
    val r1 = graft.pipeline.LinkGraph.labelProp(edges, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.core.Caches.releaseAll(spark)
    assert(r1(1L) == 5L)
    assert(r1(5L) == 1L && r1(7L) == 1L)
  }
}
