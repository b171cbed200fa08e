package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (block nested-loop join + window).
  * Scale path: LSH-bucketed search — `tables` independent hyperplane
  * bucket signatures per vector (OR-amplification); queries probe only
  * their buckets, so the join is equi on (table, bucket) instead of a
  * cross product. Recall grows with `tables`, cost with bucket size;
  * both are plan-visible knobs.
  *
  * At 100 TB the corpus side would be bucketed+sorted on (table,
  * bucket) at write time, making the probe a co-located join with no
  * corpus shuffle.
  */
object Ann {

  /** Brute-force cosine top-k: every query against every corpus row.
    * Correct but quadratic — the oracle for recall measurements.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
      qId: String, cId: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(qId).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val c = corpus.select(col(cId).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", Dedup.cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** LSH-bucketed approximate top-k with OR-amplified tables. */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
      qId: String, cId: String, vecCol: String, k: Int,
      planes: Int = 10, tables: Int = 4): DataFrame = {
    val q = queries.select(col(qId).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"),
      posexplode(bucketSignatures(col(vecCol), planes, tables)))
      .select(col("query_id"), col("qv"), col("pos").as("table"),
        col("col").as("bucket"))
    val c = corpus.select(col(cId).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv"),
      posexplode(bucketSignatures(col(vecCol), planes, tables)))
      .select(col("neighbor_id"), col("cv"), col("pos").as("table"),
        col("col").as("bucket"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    q.join(c, Seq("table", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("qv"), col("cv"))
      .distinct() // a pair can collide in several tables
      .withColumn("cos", Dedup.cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** One bucket id per table (array of `tables` longs). */
  private def bucketSignatures(vec: Column, planes: Int,
      tables: Int): Column =
    array((0 until tables).map(t =>
      (0 until planes).map { p =>
        val dot = aggregate(
          zip_with(vec.cast("array<double>"),
            sequence(lit(0), size(vec) - 1), (x, i) =>
            x * (pmod(hash(lit(t), lit(p), i), lit(2001)) - 1000)
              .cast("double") / 1000.0),
          lit(0.0d), (s, x) => s + x)
        when(dot > 0, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)): _*)
}
