package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks (the Deequ shape): a check suite
  * compiles to ONE conditional-aggregation scan whose single result
  * row unpivots to a (check_name, observed, passed) report. `observed`
  * is the VIOLATION count (0 = clean) for every check EXCEPT MinRows,
  * which reports the row count itself (its violation would be a
  * shortfall, and the count is the number the operator wants anyway);
  * `passed` is the uniform verdict column to gate on.
  *
  * Scale: all checks share one pass; uniqueness checks need a distinct
  * count, which Spark plans as an Expand (one duplicated map-side
  * stream per distinct column) inside the same aggregation — still a
  * single scan, no joins. A 100 TB validation run is therefore the
  * cost of the cheapest possible full read, which is the point: the
  * report gates the expensive pipeline behind it.
  */
object Checks {

  /** Render a bound compactly for a check name (drop ".0"). */
  private def num(d: Double): String =
    if (d.isWhole && d.abs < 1e15) d.toLong.toString else d.toString

  sealed trait Check { def name: String }
  /** Table must have at least `min` rows; observed = row count. */
  final case class MinRows(min: Long) extends Check {
    val name = s"min_rows_$min"
  }
  /** No NULLs in `c`; observed = null count. */
  final case class NotNull(c: String) extends Check {
    val name = s"not_null_$c"
  }
  /** `c` is unique; observed = rows in excess of distinct values. */
  final case class Unique(c: String) extends Check {
    val name = s"unique_$c"
  }
  /** `c` within [lo, hi]; observed = out-of-range count (NULLs don't
    * count — pair with NotNull to forbid them). */
  final case class InRange(c: String, lo: Double, hi: Double)
      extends Check {
    val name = s"in_range_${c}_${num(lo)}_${num(hi)}"
  }
  /** `c` fully matches `regex` (anchored here — the caller writes the
    * bare pattern); observed = non-matching count, NULLs exempt. */
  final case class Matches(c: String, regex: String) extends Check {
    val name = s"matches_$c"
  }

  private def observed(ck: Check): Column = ck match {
    case MinRows(_) => count(lit(1))
    case NotNull(c) => count(when(col(c).isNull, lit(1)))
    case Unique(c) => count(when(col(c).isNotNull, lit(1))) -
      countDistinct(col(c))
    case InRange(c, lo, hi) =>
      count(when(col(c) < lo || col(c) > hi, lit(1)))
    case Matches(c, re) =>
      // rlike is a substring search; anchor in a group so the check
      // is the full-string match the name promises
      count(when(!col(c).rlike("^(?:" + re + ")$"), lit(1)))
  }

  private def passed(ck: Check, obs: Column): Column = ck match {
    case MinRows(min) => obs >= min
    case _ => obs === 0L
  }

  /** Run the suite: one scan, one report row per check. Check names
    * must be unique — report rows are keyed by check_name, so two
    * indistinguishable rows (e.g. two Matches on the same column)
    * would be unusable for a consumer gating on the name. Parameters
    * are baked into MinRows/InRange names; Matches collides only on
    * same-column-different-regex, which this require surfaces. */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "empty check suite")
    val dup = checks.groupBy(_.name).collect {
      case (n, cs) if cs.size > 1 => n
    }
    require(dup.isEmpty,
      s"duplicate check names: ${dup.mkString(", ")}")
    val aggs = checks.zipWithIndex.map { case (ck, i) =>
      observed(ck).as(s"__c$i")
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val entries = checks.zipWithIndex.map { case (ck, i) =>
      struct(lit(ck.name).as("check_name"),
        col(s"__c$i").cast("long").as("observed"),
        passed(ck, col(s"__c$i")).as("passed"))
    }
    row.select(explode(array(entries: _*)).as("r")).select("r.*")
  }
}
