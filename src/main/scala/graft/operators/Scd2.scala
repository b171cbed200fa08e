package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history from an append-only
  * attribute log — the warehouse-side maintenance operator that turns
  * "every observation of (key, attribute, ts)" into versioned
  * validity intervals: one row per RUN of consecutive equal attribute
  * values, with `valid_from` / `valid_to` and the `is_current` flag.
  * This is the table shape a training-data pipeline joins against to
  * reconstruct what a dimension looked like at document-crawl time
  * (point-in-time-correct features — the as-of join's natural
  * companion, see [[AsOfJoin]]).
  *
  * Shape (100 TB): ONE shuffle on the key serves everything — the lag
  * pass that marks run starts, the running version counter (same
  * window ordering), the per-version aggregation (HashPartitioning on
  * key satisfies the (key, version) clustered distribution), and the
  * lead pass that closes each interval. No self-join of the log to
  * itself, no collect; the classic MERGE-based SCD2 maintenance is a
  * per-batch variant of the same window plan.
  *
  * Determinism: runs are ordered by (ts, tieCol) so equal-timestamp
  * observations collapse identically on every engine; change
  * detection is null-safe (a NULL attribute is a value, and
  * NULL→NULL is not a change).
  */
object Scd2 {

  /** @param df     observation log
    * @param keyCol dimension key
    * @param attrCol tracked attribute (any orderable type)
    * @param tsCol  observation time
    * @param tieCol unique-ish column breaking equal-ts ties
    * @return (key, version, attr, valid_from, valid_to, n_obs,
    *         is_current) — version counts runs from 1 in time order;
    *         valid_to is the next run's valid_from, NULL on the
    *         current run
    */
  def history(df: DataFrame, keyCol: String, attrCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val run = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val byVersion = Window.partitionBy(keyCol).orderBy(col("version"))
    df.select(col(keyCol), col(attrCol), col(tsCol), col(tieCol))
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .withColumn("__first", row_number().over(w) === 1)
      .withColumn("__chg",
        when(col("__first") || !(col(attrCol) <=> col("__prev")), 1L)
          .otherwise(0L))
      .withColumn("version", sum("__chg").over(run))
      .groupBy(col(keyCol), col("version"))
      .agg(first(col(attrCol)).as("attr"),
        min(col(tsCol)).as("valid_from"),
        count(lit(1)).as("n_obs"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byVersion))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(keyCol), col("version"), col("attr"),
        col("valid_from"), col("valid_to"), col("n_obs"),
        col("is_current"))
  }
}
