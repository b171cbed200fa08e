package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Privacy gating for training-data release: k-anonymity over
  * quasi-identifier columns (Sweeney 2002) — every combination of
  * quasi-identifier values must cover at least k rows, or those rows
  * are re-identifiable by joining the released data against an
  * external dataset carrying the same attributes.
  *
  * Complements [[Checks]] (whose suite is a single-row conditional
  * aggregation): k-anonymity needs a per-class aggregation, so it
  * lives here with its own one-shuffle plan shapes.
  */
object Privacy {

  /** Per-equivalence-class report: one hash aggregation on the
    * quasi-identifier tuple (partial+final, one shuffle keyed by the
    * class — the minimum possible), `class_size` and the `ok = size
    * ≥ k` verdict per class. NULL quasi values form their own class
    * (first-class in Spark's groupBy), matching the attacker model —
    * a NULL combination is as joinable as any other.
    */
  def kAnonymityClasses(df: DataFrame, quasi: Seq[Column],
      k: Long): DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier")
    require(k >= 1, "k must be positive")
    df.groupBy(quasi: _*)
      .agg(count(lit(1)).as("class_size"))
      .withColumn("ok", col("class_size") >= k)
  }

  /** One-row summary for dashboards/gating: class counts, rows at
    * risk (members of classes smaller than k), and the smallest
    * class — the number that IS the dataset's k.
    */
  def kAnonymitySummary(df: DataFrame, quasi: Seq[Column],
      k: Long): DataFrame =
    kAnonymityClasses(df, quasi, k).agg(
      count(lit(1)).as("n_classes"),
      count(when(!col("ok"), lit(1))).as("n_violating_classes"),
      coalesce(sum(when(!col("ok"), col("class_size"))), lit(0L))
        .as("n_rows_at_risk"),
      min(col("class_size")).as("min_class_size"))

  /** Suppression remedy: drop every row whose equivalence class has
    * fewer than k members — the released frame is k-anonymous by
    * construction. ONE exchange (a count window over the class key);
    * no join, no second scan of the input.
    */
  def suppressSmallClasses(df: DataFrame, quasi: Seq[Column],
      k: Long): DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier")
    require(k >= 1, "k must be positive")
    val w = Window.partitionBy(quasi: _*)
    df.withColumn("__csz", count(lit(1)).over(w))
      .filter(col("__csz") >= k)
      .drop("__csz")
  }
}
