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

  test("salted join matches plain join results") {
    val big = (1 to 1000).map(i => (if (i % 10 == 0) 1L else i.toLong, i))
      .toDF("k", "v") // key 1 is hot
    val small = Seq((1L, "hot"), (2L, "a"), (500L, "b")).toDF("k", "name")
    val plain = big.join(small, "k").count()
    val salted = SaltedJoin.join(big, small, "k", salts = 8).count()
    assert(salted == plain)
  }
}
