package graft.streaming

import graft.SparkSpec
import graft.operators.SaltedJoin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class SessionSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)
  import EventStreams.{SessionEvent, SessionOut}

  test("flatMapGroupsWithState sessionization closes on gap") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    // user 1: two sessions separated by >30min; user 2: one session
    input.addData(
      SessionEvent(1L, t("2026-01-01 10:00:00"), 1.0),
      SessionEvent(1L, t("2026-01-01 10:10:00"), 2.0),
      SessionEvent(1L, t("2026-01-01 11:00:00"), 4.0),
      SessionEvent(2L, t("2026-01-01 10:05:00"), 8.0))
    val q = EventStreams.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    // the first user-1 session closed by the 11:00 event (gap > 30min)
    val rows = spark.table("sessions").as[SessionOut].collect()
    assert(rows.length == 1)
    assert(rows(0).user_id == 1L && rows(0).n_events == 2L &&
      rows(0).sum_value == 3.0)
  }

  test("funnel stream == batch verdicts under out-of-order arrival") {
    implicit val ctx = spark.sqlContext
    import EventStreams.{FunnelEvent, FunnelOut}
    val steps = Seq("view", "click", "purchase")
    val input = MemoryStream[FunnelEvent]
    // batch 1: user 1's click arrives BEFORE its view; user 2 has a
    // purchase with no click (chain must stop at 1)
    input.addData(
      FunnelEvent(1L, t("2026-01-01 10:30:00"), "click"),
      // microsecond component: the emitted t0 must carry it exactly
      FunnelEvent(2L, t("2026-01-01 10:00:00.000123"), "view"),
      FunnelEvent(2L, t("2026-01-01 10:20:00"), "purchase"),
      // user 4: an ANCHORED user whose buffered click sits BEFORE the
      // current anchor — the state prune must keep it for the late
      // earlier view below (the review-caught re-anchor hazard)
      FunnelEvent(4L, t("2026-01-01 10:30:00"), "view"),
      FunnelEvent(4L, t("2026-01-01 10:00:00"), "click"))
    // batch 2: late earlier views re-anchor users 1 and 4 — only a
    // buffered replay gets the chain right; user 3 never hits a step
    input.addData(
      FunnelEvent(1L, t("2026-01-01 10:00:00"), "view"),
      FunnelEvent(1L, t("2026-01-01 11:00:00"), "purchase"),
      FunnelEvent(4L, t("2026-01-01 09:50:00"), "view"),
      FunnelEvent(3L, t("2026-01-01 10:00:00"), "error"))
    // watermark pusher: a far-future event closes users 1 and 2
    input.addData(
      FunnelEvent(99L, t("2026-01-02 12:00:00"), "view"))
    val q = EventStreams.funnelStream(input.toDS(), steps,
        windowMs = 2 * 60 * 60 * 1000L)
      .writeStream.format("memory").queryName("funnelout")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("funnelout").as[FunnelOut].collect()
      .map(o => o.user_id -> ((o.steps_reached, Option(o.t0)))).toMap
    // batch authority over the union of batches, windowMinutes = 120
    val all = Seq(
      (1L, "click", t("2026-01-01 10:30:00")),
      (2L, "view", t("2026-01-01 10:00:00.000123")),
      (2L, "purchase", t("2026-01-01 10:20:00")),
      (4L, "view", t("2026-01-01 10:30:00")),
      (4L, "click", t("2026-01-01 10:00:00")),
      (4L, "view", t("2026-01-01 09:50:00")),
      (1L, "view", t("2026-01-01 10:00:00")),
      (1L, "purchase", t("2026-01-01 11:00:00")),
      (3L, "error", t("2026-01-01 10:00:00")))
      .toDF("user_id", "event_type", "ts")
    val want = graft.operators.Funnel.funnel(all, "user_id",
        "event_type", "ts", steps, windowMinutes = 120)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), Option(r.getTimestamp(2))))).toMap
    assert(got.contains(1L) && got.contains(2L),
      s"closed users must emit; got $got")
    assert(got(1L) == want(1L) && got(1L)._1 == 3)
    assert(got(2L) == want(2L) && got(2L)._1 == 1)
    assert(got(4L) == want(4L) && got(4L)._1 == 2,
      "the pre-anchor click must survive the prune for the re-anchor")
    assert(!got.contains(3L),
      "users with no step-typed event emit nothing (contract)")
    assert(!got.contains(99L), "open funnel must not emit")
  }

  test("salted join matches plain join results") {
    val big = (1 to 1000).map(i => (if (i % 10 == 0) 1L else i.toLong, i))
      .toDF("k", "v") // key 1 is hot
    val small = Seq((1L, "hot"), (2L, "a"), (500L, "b")).toDF("k", "name")
    val plain = big.join(small, "k").count()
    val salted = SaltedJoin.join(big, small, "k", salts = 8).count()
    assert(salted == plain)
  }
}
