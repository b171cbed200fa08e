package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout — the write-time contract that makes
  * recurring large-large joins co-located at read time.
  *
  * At 100 TB a fact-fact join (orders ⋈ lineitem, corpus ⋈ corpus
  * near-dup verify) shuffles both sides on every run unless the data
  * is laid out pre-partitioned. `bucketBy(n, key) + sortBy(key)`
  * persists Spark's hash partitioning into the table format, so a
  * join (or aggregation) on the bucket key plans with NO Exchange on
  * the bucketed sides — write once, join shuffle-free forever. The
  * same layout serves the EAV store (bucket triples by attribute or
  * entity) and the ANN corpus (bucket by LSH table/bucket id, making
  * the probe join co-located).
  *
  * Bucket-count discipline: both sides of a co-located join need the
  * SAME bucket count (or one a divisor of the other with
  * `spark.sql.bucketing.coalesceBucketsInJoin.enabled`).
  */
object Bucketing {

  /** Persist a frame bucketed+sorted by `key` as a managed parquet
    * table. One shuffle now, none on every later join/agg on `key`.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Join two tables bucketed on the same key — plans without an
    * Exchange on either side (BucketingSpec pins this).
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Aggregation on the bucket key — also Exchange-free: the bucket
    * layout satisfies the required child distribution.
    */
  def bucketedAgg(spark: SparkSession, table: String, key: String,
      aggs: (String, String)*): DataFrame =
    spark.table(table).groupBy(key)
      .agg(aggs.head._1 -> aggs.head._2,
        aggs.tail.map(a => a._1 -> a._2): _*)
}
