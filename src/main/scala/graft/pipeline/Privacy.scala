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

  /** Distinct l-diversity per equivalence class (Machanavajjhala et
    * al., ICDE 2006): k-anonymity stops homogeneity attacks only if
    * each class also carries at least `l` DISTINCT sensitive values —
    * a class of 50 rows that all share one diagnosis discloses it to
    * anyone who can place a person in the class.
    *
    * Also reports recursive (c,l)-diversity on the same pass: with
    * per-class sensitive-value counts r1 ≥ r2 ≥ … ≥ rm, the class is
    * (c,l)-diverse iff r1 < c·(r_l + r_{l+1} + … + r_m) — the most
    * common value must not dominate the tail beyond factor c, which
    * rules out "l distinct values but 99% one of them" classes that
    * pass the distinct test. All arithmetic is exact integers, so
    * any engine replays the verdicts bit-for-bit.
    *
    * Scale shape: one partial-agg shuffle on (quasi, sensitive) — the
    * distinct-counting pattern — then one on the quasi tuple; both
    * hash aggregations, no windows over raw rows, no collect. The
    * r1/tail split rides a window over the (class, value) CELL frame
    * (|classes|·|values-per-class| rows, already aggregated), not the
    * input.
    *
    * @return one row per class: quasi columns, class_size,
    *         n_sensitive (distinct sensitive values), top_count (r1),
    *         tail_count (Σ_{i≥l} r_i), ok_distinct (n_sensitive ≥ l),
    *         ok_recursive (r1 < c·tail_count)
    */
  def lDiversityClasses(df: DataFrame, quasi: Seq[Column],
      sensitive: Column, l: Int, c: Long = 2L): DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier")
    require(l >= 1, "l must be positive")
    require(c >= 1, "c must be positive")
    val cells = df.groupBy((quasi :+ sensitive.as("__sv")): _*)
      .agg(count(lit(1)).as("__n"))
    val quasiNames = cells.columns.dropRight(2)
    // rank sensitive values inside each class by count desc (ties by
    // value for determinism); the window runs over the aggregated
    // cell frame, whose width per class is the sensitive cardinality
    val w = Window.partitionBy(quasiNames.map(col): _*)
      .orderBy(col("__n").desc, col("__sv").cast("string"))
    cells.withColumn("__rk", row_number().over(w))
      .groupBy(quasiNames.map(col): _*)
      .agg(sum(col("__n")).as("class_size"),
        count(lit(1)).as("n_sensitive"),
        max(when(col("__rk") === 1, col("__n"))).as("top_count"),
        coalesce(sum(when(col("__rk") >= l, col("__n"))), lit(0L))
          .as("tail_count"))
      .withColumn("ok_distinct", col("n_sensitive") >= l)
      .withColumn("ok_recursive", col("top_count") < lit(c) * col("tail_count"))
  }
}
