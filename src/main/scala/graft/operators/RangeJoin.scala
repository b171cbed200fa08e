package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pure range join — points joined to intervals by containment with NO
  * equi key — via time-bucket blocking.
  *
  * Spark has no interval-join physical operator: `points JOIN
  * intervals ON p BETWEEN s AND e` with no equality conjunct plans as
  * BroadcastNestedLoopJoin (fine only while one side broadcasts) or a
  * cartesian product (never fine). The classic fix — the same
  * blocking idea as Flink's interval join and the Databricks range-
  * join hint — is to quantize the domain into fixed-width buckets:
  * each point hashes to exactly ONE bucket, each interval explodes to
  * the (few) buckets it overlaps, and the join becomes a plain
  * shuffled equi-join on bucket id with the exact containment
  * predicate re-checked inside the bucket.
  *
  * Shape (100 TB): one Generate (≤ len/width + 1 rows per interval —
  * callers pick `bucketWidth` on the order of the max interval length
  * so this is 2-3) and one hash-partitioned exchange per side, keyed
  * by bucket. No replication of the points side, no nested loop.
  * Bucket population is bounded by point rate × width, so skew only
  * appears if the DATA is bursty on exactly that width; `saltBuckets`
  * splits each bucket's points into N sub-buckets and replicates
  * intervals across them (the q_salted_join discipline) when it is.
  *
  * Output is one row per (interval, contained point) pair — callers
  * aggregate. End boundary is exclusive ([s, e)), matching window
  * semantics everywhere else in the engine (events_hourly, sessions).
  */
object RangeJoin {

  /** Join `points` to `intervals` on `s <= p < e` using bucket
    * blocking. `pointCol`/`startCol`/`endCol` are timestamp columns;
    * `bucketWidthUs` is the blocking quantum in microseconds.
    * Column names must be disjoint across the two inputs.
    */
  def intervalJoin(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      bucketWidthUs: Long, saltBuckets: Int = 1): DataFrame = {
    require(bucketWidthUs > 0, "bucketWidthUs must be positive")
    require(saltBuckets >= 1, "saltBuckets must be >= 1")
    def bucketOf(ts: Column): Column =
      floor(unix_micros(ts) / lit(bucketWidthUs))
    // Exclusive end: an interval touching a bucket boundary exactly
    // (e = k*width) contributes nothing to bucket k, so explode only
    // up to the bucket of the last contained microsecond.
    val endBucket = floor((unix_micros(col(endCol)) - 1) /
      lit(bucketWidthUs))
    val salted = saltBuckets > 1
    val iv = intervals
      .withColumn("__bucket", explode(sequence(
        bucketOf(col(startCol)), greatest(endBucket,
          bucketOf(col(startCol))))))
      .withColumn("__salt", if (salted)
        explode(sequence(lit(0), lit(saltBuckets - 1))) else lit(0))
    val pt = points
      .withColumn("__bucket", bucketOf(col(pointCol)))
      .withColumn("__salt", if (salted)
        pmod(hash(col(pointCol)), lit(saltBuckets)) else lit(0))
    pt.join(iv, Seq("__bucket", "__salt"))
      .filter(col(pointCol) >= col(startCol) &&
        col(pointCol) < col(endCol))
      .drop("__bucket", "__salt")
  }
}
