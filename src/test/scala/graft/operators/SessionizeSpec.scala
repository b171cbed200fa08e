package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
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

  test("one exchange serves lag, running sum, and aggregation") {
    val p = Sessionize.sessions(events, "user_id", "ts", "value")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1,
      s"expected exactly one hash exchange (user key), got $exchanges:\n$p")
  }
}
