package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  private def naive(points: DataFrame, intervals: DataFrame,
      p: String, s: String, e: String): DataFrame =
    points.crossJoin(intervals)
      .filter(col(p) >= col(s) && col(p) < col(e))

  test("bucketed interval join == theta join on crafted boundaries") {
    val pts = Seq(
      (1L, t("2026-01-01 10:00:00")),  // == start: in
      (2L, t("2026-01-01 10:00:59")),  // inside
      (3L, t("2026-01-01 10:01:00")),  // == end: out (exclusive)
      (4L, t("2026-01-01 09:59:59")),  // before: out
      (5L, t("2026-01-01 10:02:30")),  // second interval only
      (6L, t("2026-01-01 23:00:00")))  // matches nothing
      .toDF("p_id", "p_ts")
    val iv = Seq(
      (10L, t("2026-01-01 10:00:00"), t("2026-01-01 10:01:00")),
      (11L, t("2026-01-01 10:02:00"), t("2026-01-01 10:04:00")),
      // interval entirely inside one bucket
      (12L, t("2026-01-01 10:00:10"), t("2026-01-01 10:00:20")),
      // interval spanning 3+ buckets
      (13L, t("2026-01-01 09:59:30"), t("2026-01-01 10:03:30")))
      .toDF("win_id", "win_start", "win_end")
    for (width <- Seq(1000000L, 60L * 1000000L, 3600L * 1000000L);
        salt <- Seq(1, 4)) {
      val got = RangeJoin.intervalJoin(pts, iv, "p_ts", "win_start",
          "win_end", width, saltBuckets = salt)
        .select("p_id", "win_id").as[(Long, Long)].collect().toSet
      val want = naive(pts, iv, "p_ts", "win_start", "win_end")
        .select("p_id", "win_id").as[(Long, Long)].collect().toSet
      assert(got == want, s"width=$width salt=$salt")
    }
  }

  test("plans as an equi-join, not a nested loop / cartesian") {
    val ev = Tables.events(spark, sf())
    val iv = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("win_id"), col("ts").as("win_start"),
        (col("ts") + expr("INTERVAL 90 SECONDS")).as("win_end"))
    val pts = ev.select(col("event_id").as("p_id"), col("ts").as("p_ts"))
    val plan = RangeJoin.intervalJoin(pts, iv, "p_ts", "win_start",
        "win_end", 90L * 1000000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      plan)
  }

  test("gate composition matches a naive window count on real events") {
    val ev = Tables.events(spark, sf()).limit(2000)
      .select("event_id", "ts", "value", "event_type")
    val want = {
      val iv = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("win_id"), col("ts").as("s"),
          (col("ts") + expr("INTERVAL 90 SECONDS")).as("e"))
      iv.join(ev.as("p"),
          col("p.ts") >= col("s") && col("p.ts") < col("e") &&
            col("p.event_id") =!= col("win_id"), "left")
        .groupBy("win_id").agg(count(col("p.event_id")).as("n"))
        .as[(Long, Long)].collect().toMap
    }
    val iv2 = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("win_id"), col("ts").as("win_start"),
        (col("ts") + expr("INTERVAL 90 SECONDS")).as("win_end"))
    val pts = ev.select(col("event_id").as("p_id"), col("ts").as("p_ts"))
    val counts = RangeJoin.intervalJoin(pts, iv2, "p_ts", "win_start",
        "win_end", 90L * 1000000L)
      .filter(col("p_id") =!= col("win_id"))
      .groupBy("win_id").agg(count(lit(1)).as("n"))
    val got = iv2.select("win_id").join(counts, Seq("win_id"), "left")
      .select(col("win_id"), coalesce(col("n"), lit(0L)))
      .as[(Long, Long)].collect().toMap
    assert(got == want)
  }
}
