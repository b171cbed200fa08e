package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming operators (SURVEY.md §2.12 green-field: the
  * reference has no streaming; these are the streaming shapes of the
  * batch operators so a pipeline can run over `readStream` unchanged).
  *
  * All transforms take and return streaming DataFrames; sources/sinks
  * stay with the caller (`readStream.parquet/kafka` → `writeStream`).
  */
object EventStreams {

  /** Tumbling-window event rollup with a watermark — the streaming twin
    * of RelationalQueries.qEventsHourly. Late data beyond the watermark
    * is dropped; state is bounded.
    */
  def hourlyRollup(events: DataFrame,
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming exact dedup on a key with bounded state: duplicates
    * within the watermark horizon are dropped (the streaming form of
    * Dedup.exactDedup).
    */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Sliding-window rate monitor (5-minute slide over 1-hour window). */
  def slidingRate(events: DataFrame,
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "5 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))
}
