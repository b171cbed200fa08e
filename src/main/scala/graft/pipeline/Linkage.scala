package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Record linkage / entity resolution over structured records: the
  * blocking → verify → cluster pipeline (Fellegi–Sunter shape) that
  * deduplicates a REGISTRY (customers, suppliers, addresses) rather
  * than a text corpus — the structured twin of [[Dedup]].
  *
  * Scale shape (100 TB): all-pairs comparison is quadratic and never
  * runs; candidates come only from records sharing a BLOCKING key
  * (any of several — OR-blocking unions the key spaces, each key
  * tagged so values never collide across keys), each key bucket
  * capped like every LSH family here (`maxBucket`: a degenerate key
  * — empty string, a default value — would otherwise fan out its
  * bucket quadratically). The verify stage runs the edit-distance
  * predicate on candidate pairs only, and entity formation is the
  * same edge-touched-nodes-only connected components
  * [[Dedup.dupGroups]] the near-dup family uses. Every stage is
  * engine-portable arithmetic (levenshtein agrees across engines —
  * gate p_er replays the whole pipeline in SQL).
  */
object Linkage {

  /** Candidate pairs (id1 < id2, distinct) from OR-blocking: records
    * sharing ANY of the `keys` values. NULL keys never block (an
    * unknown field is evidence of nothing).
    */
  def candidates(df: DataFrame, idCol: String, keys: Seq[Column],
      maxBucket: Int = 1000): DataFrame = {
    require(keys.nonEmpty, "need at least one blocking key")
    val tagged = keys.zipWithIndex.map { case (k, i) =>
      struct(lit(i).as("t"), k.cast("string").as("v"))
    }
    val blocked = graft.core.Caches.stage(
      df.select(col(idCol).as("id"),
          explode(array(tagged: _*)).as("b"))
        .filter(col("b.v").isNotNull)
        .select(col("id"), col("b.t").as("t"), col("b.v").as("v"))
        .distinct()
        .withColumn("__n",
          count(lit(1)).over(Window.partitionBy("t", "v")))
        .filter(col("__n") <= maxBucket).drop("__n"))
    blocked.as("l")
      .join(blocked.as("r"),
        col("l.t") === col("r.t") && col("l.v") === col("r.v") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id1"), col("r.id").as("id2"))
      .distinct()
  }

  /** Verified link pairs: candidates whose `nameCol` edit distance is
    * ≤ `maxDist`. The name lookup for pair sides is a join back to
    * the registry (the registry frame is the small side of nothing —
    * both joins are id-equi-joins on the candidate frame).
    */
  def linkPairs(df: DataFrame, idCol: String, nameCol: String,
      keys: Seq[Column], maxDist: Int,
      maxBucket: Int = 1000): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val names = df.select(col(idCol).as("__nid"),
      col(nameCol).as("__nm"))
    candidates(df, idCol, keys, maxBucket)
      .join(names.withColumnRenamed("__nid", "id1")
        .withColumnRenamed("__nm", "__n1"), "id1")
      .join(names.withColumnRenamed("__nid", "id2")
        .withColumnRenamed("__nm", "__n2"), "id2")
      .withColumn("dist", levenshtein(col("__n1"), col("__n2")))
      .filter(col("dist") <= maxDist)
      .select(col("id1"), col("id2"), col("dist"))
  }

  /** Entity assignment: connected components over the verified link
    * graph — (id, entity) where entity = min linked id; unlinked
    * records are their own entity.
    */
  def entities(df: DataFrame, idCol: String, nameCol: String,
      keys: Seq[Column], maxDist: Int,
      maxBucket: Int = 1000): DataFrame =
    Dedup.dupGroups(df, idCol,
        linkPairs(df, idCol, nameCol, keys, maxDist, maxBucket))
      .withColumnRenamed("comp", "entity")
}
