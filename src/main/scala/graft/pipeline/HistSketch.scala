package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable fixed-width histogram sketch for quantile estimation.
  *
  * Each shard builds its own (key, bin) → count histogram where the
  * data lives; histograms are CELL-WISE ADDITIVE, so the merge is a
  * groupBy-sum over at most |keys| × |bins| rows per shard — the same
  * write-once/merge-at-query-time shape as the HLL (q_sketch_merge)
  * and count-min (p_cms) family. A quantile estimate reads the
  * cumulative counts of the merged histogram: the upper edge of the
  * first bin whose cumulative count reaches ceil(q·n), which
  * over-estimates the exact order statistic by at most one bin width.
  *
  * Everything is deterministic: floor(value/width) is one IEEE double
  * division (identical on any engine), counts are integers, and the
  * estimate is (bin+1)·width — so unlike rank-error sketches (GK /
  * KLL) the whole lifecycle replays bit-for-bit in an external
  * oracle. The trade is a value-domain assumption (bounded range,
  * width chosen up front) instead of a rank-error guarantee.
  *
  * Reference analogue: RADmapper exposes aggregate statistics through
  * its builtin library (src/lib/rad_mapper/builtin.cljc $sum/$max
  * family); a distributed engine needs the mergeable-summary form.
  */
object HistSketch {

  /** Bin index of a value: floor(v / width), clamped at 0 so negative
    * outliers land in the first bin rather than a negative cell.
    * NULL-propagating: greatest() ignores NULLs, so without the guard
    * a NULL value would silently land in bin 0 — the builds filter
    * NULLs anyway, but the SQL surface (graft_hist_bin) exposes this
    * directly and must behave like a normal scalar. */
  def bin(v: Column, width: Double): Column =
    when(v.isNotNull,
      greatest(floor(v / lit(width)).cast("long"), lit(0L)))

  /** Per-shard histogram cells: (key, shard, bin) → cnt. ONE scan; the
    * shard key is a column (partition, ingest batch, day), never a
    * filter, so sharding adds no passes. NULL values are dropped —
    * quantiles are over the non-null population (greatest() would
    * otherwise silently fold NULL into bin 0 and inflate it). */
  def buildSharded(df: DataFrame, keyCol: String, valueCol: String,
      shardCol: Column, width: Double): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .select(col(keyCol).as("key"), shardCol.as("shard"),
        bin(col(valueCol), width).as("bin"))
      .groupBy("key", "shard", "bin")
      .agg(count(lit(1)).as("cnt"))

  /** Unsharded build (a single logical shard). */
  def build(df: DataFrame, keyCol: String, valueCol: String,
      width: Double): DataFrame =
    buildSharded(df, keyCol, valueCol, lit(0), width).drop("shard")

  /** Cell-wise merge of sharded histograms — the additivity property.
    * Only (key, bin, cnt) rows cross the exchange, never data rows. */
  def merge(cells: DataFrame): DataFrame =
    cells.groupBy("key", "bin").agg(sum("cnt").as("cnt"))

  /** Quantile estimates from a merged histogram: for each requested
    * (name, q), the upper edge of the first bin whose cumulative count
    * reaches ceil(q·n). The window runs over |keys| × |bins| histogram
    * rows (the sketch, not the data), so the few-keys parallelism
    * cliff of ranking raw rows never appears. */
  def quantiles(hist: DataFrame, qs: Seq[(String, Double)],
      width: Double): DataFrame = {
    val byKey = Window.partitionBy("key")
    val cum = hist
      .withColumn("cum", sum("cnt").over(byKey.orderBy("bin")))
      .withColumn("n", sum("cnt").over(byKey))
    val ests = qs.map { case (name, q) =>
      min(when(col("cum") >= ceil(col("n") * q).cast("long"),
        (col("bin") + 1).cast("double") * lit(width))).as(name)
    }
    cum.groupBy("key")
      .agg(max("n").as("n"), ests: _*)
      .select(col("key") +: col("n") +: qs.map(p => col(p._1)): _*)
  }
}
