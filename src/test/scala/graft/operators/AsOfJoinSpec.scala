package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("as-of picks the latest state at or before the event") {
    val events = Seq(
      (1L, 100L, t("2026-01-01 10:00:00")),
      (2L, 100L, t("2026-01-01 12:00:00")),
      (3L, 100L, t("2026-01-01 09:00:00")), // before any state → null
      (4L, 200L, t("2026-01-01 11:00:00")))
      .toDF("event_id", "user_id", "ts")
    val state = Seq(
      (100L, t("2026-01-01 10:00:00"), "v1"), // boundary: applies at 10:00
      (100L, t("2026-01-01 11:30:00"), "v2"),
      (200L, t("2026-01-01 08:00:00"), "s1"))
      .toDF("user_id", "valid_from", "version")
    val out = AsOfJoin.asOf(events, state, Seq("user_id"), "ts",
      "valid_from", Seq("version"))
      .select("event_id", "version").as[(Long, Option[String])]
      .collect().toMap
    assert(out == Map(1L -> Some("v1"), 2L -> Some("v2"),
      3L -> None, 4L -> Some("s1")))
  }
}
