package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import org.apache.spark.sql.functions.{session_window => sparkSessionWindow}
import java.sql.Timestamp

/** Batch sessionization: gap splits, per-user isolation, and the
  * single-exchange plan contract.
  */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  private def events = Seq(
    (1L, t("2026-01-01 10:00:00"), 1.0),
    (1L, t("2026-01-01 10:10:00"), 2.0), // same session (10 min)
    (1L, t("2026-01-01 11:00:00"), 3.0), // 50-min gap -> new session
    (2L, t("2026-01-01 10:05:00"), 5.0)) // other user, own session
    .toDF("user_id", "ts", "value")

  test("gap threshold splits sessions per user") {
    val got = Sessionize.sessions(events, "user_id", "ts", "value",
        gapMinutes = 30)
      .orderBy("user_id", "session_id")
      .select("user_id", "session_id", "n_events", "sum_value")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 1L, 2L, 3.0), (1L, 2L, 1L, 3.0),
      (2L, 1L, 1L, 5.0)))
  }

  test("session bounds are the min/max event times") {
    val r = Sessionize.sessions(events, "user_id", "ts", "value")
      .filter(col("user_id") === 1 && col("session_id") === 1).head()
    assert(r.getAs[Timestamp]("session_start") == t("2026-01-01 10:00:00"))
    assert(r.getAs[Timestamp]("session_end") == t("2026-01-01 10:10:00"))
  }

  test("sessions == Spark's native session_window, including the " +
      "exactly-gap boundary") {
    // random-ish multiset, spacing never EXACTLY the gap
    val rnd = new scala.util.Random(42)
    val rows = (0 until 300).map { i =>
      val u = (i % 7).toLong
      val s = rnd.nextInt(7200)
      (u, new Timestamp(
        t("2026-01-01 00:00:00").getTime + s * 1000L + 1L), 1.0)
    }
    val df = rows.toDF("user_id", "ts", "value")
    val ours = Sessionize.sessions(df, "user_id", "ts", "value",
        gapMinutes = 10)
      .select("user_id", "session_start", "session_end", "n_events")
      .collect().map(_.toString).sorted.toSeq
    // session identity (membership) must agree: compare per-user
    // session sizes and bounds via the event->session mapping
    val nativeSess = df.select(col("user_id"), col("ts"),
        sparkSessionWindow(col("ts"), "10 minutes").as("w"))
      .groupBy("user_id", "w")
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
        count(lit(1)).as("n_events"))
      .select("user_id", "session_start", "session_end", "n_events")
      .collect().map(_.toString).sorted.toSeq
    assert(ours == nativeSess,
      "gap sessionization must agree with session_window off-boundary")
    // boundary convention: events EXACTLY gap apart MERGE under both
    // implementations (ours: strict '>' on the gap; Spark's window
    // also admits an event landing exactly on the session end)
    val boundary = Seq(
      (1L, t("2026-01-01 10:00:00"), 1.0),
      (1L, t("2026-01-01 10:10:00"), 1.0))
      .toDF("user_id", "ts", "value")
    assert(Sessionize.sessions(boundary, "user_id", "ts", "value",
      gapMinutes = 10).count() == 1)
    assert(boundary.groupBy(col("user_id"),
        sparkSessionWindow(col("ts"), "10 minutes"))
      .count().count() == 1)
  }

  test("one exchange serves lag, running sum, and aggregation") {
    val p = Sessionize.sessions(events, "user_id", "ts", "value")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1,
      s"expected exactly one hash exchange (user key), got $exchanges:\n$p")
  }
}
