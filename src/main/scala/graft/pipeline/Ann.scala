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
      planes: Int = 10, tables: Int = 4, dim: Int = 64): DataFrame = {
    val q = queries.select(col(qId).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"),
      posexplode(bucketSignatures(col(vecCol), planes, tables, dim)))
      .select(col("query_id"), col("qv"), col("pos").as("table"),
        col("col").as("bucket"))
    val c = corpus.select(col(cId).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv"),
      posexplode(bucketSignatures(col(vecCol), planes, tables, dim)))
      .select(col("neighbor_id"), col("cv"), col("pos").as("table"),
        col("col").as("bucket"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    // dedup multi-table collisions on the ID pair only (distinct over
    // the embedding arrays would drag the vectors through the shuffle
    // comparator), then re-attach one vector per side.
    val pairs = q.drop("qv").join(c.drop("cv"), Seq("table", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id").distinct()
    val qv = queries.select(col(qId).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val cv = corpus.select(col(cId).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv"))
    pairs.join(qv, "query_id").join(cv, "neighbor_id")
      .withColumn("cos", Dedup.cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** One bucket id per table (array of `tables` longs) — a single
    * custom-expression pass over the vector (same seeding as
    * Dedup.hyperplaneBucket with seed 7000+t).
    */
  private def bucketSignatures(vec: Column, planes: Int,
      tables: Int, dim: Int): Column =
    graft.functions.HyperplaneBuckets(vec, planes, tables, dim, 7000)

  // ---------- IVF (inverted file) ----------
  //
  // Coarse quantization: every corpus vector lands in the list of its
  // nearest centroid; queries probe only the `nprobe` nearest lists,
  // so the candidate join is equi on the centroid id — the same
  // co-locatable join shape as LSH with recall controlled by nprobe.
  // Centroids here are deterministic unit vectors (seeded); a
  // production system k-means them on a sample, but the assignment /
  // probe / join topology — the part that has to scale — is identical,
  // and determinism keeps the operator oracle-checkable.

  /** Deterministic unit-norm centroid matrix (row = centroid). Public
    * so oracle SQL can embed identical literals.
    */
  def centroids(k: Int, dim: Int, seed: Int): Array[Array[Double]] =
    Array.tabulate(k) { c =>
      val rnd = new scala.util.Random(seed.toLong * 7919L + c)
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }

  /** Nearest-centroid assignment (the corpus-side list id) — one
    * codegen'd pass over the vector (graft.functions.CentroidRank);
    * exact ties break toward the larger id, matching the oracle.
    */
  def assignCentroid(vec: Column, k: Int = 16, dim: Int = 64,
      seed: Int = 4242): Column =
    element_at(graft.functions.CentroidRank(vec, k, dim, seed, 1), 1)

  /** The `nprobe` nearest centroid ids (query-side probe list). */
  def probeCentroids(vec: Column, nprobe: Int, k: Int = 16,
      dim: Int = 64, seed: Int = 4242): Column =
    graft.functions.CentroidRank(vec, k, dim, seed, nprobe)

  /** IVF approximate top-k: probe lists → equi-join on centroid id →
    * exact cosine rank within candidates. At scale the corpus side is
    * written bucketed by centroid id (sources.Bucketing), making the
    * probe a co-located join with no corpus shuffle.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame,
      qId: String, cId: String, vecCol: String, k: Int,
      nCentroids: Int = 16, nprobe: Int = 4, dim: Int = 64,
      seed: Int = 4242): DataFrame = {
    val q = queries.select(col(qId).as("query_id"),
      explode(probeCentroids(col(vecCol).cast("array<double>"),
        nprobe, nCentroids, dim, seed)).as("cent"))
    val c = corpus.select(col(cId).as("neighbor_id"),
      assignCentroid(col(vecCol).cast("array<double>"),
        nCentroids, dim, seed).as("cent"))
    val pairs = q.join(c, Seq("cent"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id").distinct()
    val qv = queries.select(col(qId).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val cv = corpus.select(col(cId).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    pairs.join(qv, "query_id").join(cv, "neighbor_id")
      .withColumn("cos", Dedup.cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }
}
