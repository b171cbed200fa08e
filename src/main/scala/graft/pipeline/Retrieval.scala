package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Hybrid-retrieval fusion: combine independently produced ranked
  * candidate lists (lexical BM25, vector ANN, …) into one ranking.
  *
  * The training-data angle: retrieval-based dedup/decontamination and
  * RAG-corpus curation both end with "merge the lexical and the
  * embedding shortlist", and rank fusion is the standard way to do it
  * without score calibration across heterogeneous scorers.
  */
object Retrieval {

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
    * given N ranked lists with columns (query_id, doc_id, rank),
    * `score(q, d) = Σ_lists 1 / (kConst + rank_list(d))` — documents
    * absent from a list contribute nothing — then re-rank per query by
    * the fused score. `kConst = 60` is the paper's constant.
    *
    * Scale shape: inputs are top-k lists, so the unioned frame is
    * |queries| × k × N rows regardless of corpus size; ONE shuffle on
    * query_id covers both the fusion aggregate and the re-rank window
    * (the aggregate's (query_id, doc_id) hash partitioning satisfies
    * the window's query_id clustering only if Spark plans them on the
    * same key set — it does not, so this is one exchange per step with
    * AQE-coalesced tiny partitions; both frames are shortlist-sized,
    * never corpus-sized).
    *
    * The per-addend decimal rounding (`Tables.dsum`) keeps the fused
    * score independent of Spark's reduction order, so an SQL oracle
    * replays it exactly.
    */
  def rrf(lists: Seq[DataFrame], kConst: Int = 60, topK: Int = 10,
      scale: Int = 12): DataFrame = {
    require(lists.nonEmpty, "rrf needs at least one ranked list")
    val uni = lists.map(_.select(col("query_id"), col("doc_id"),
      col("rank").cast("int").as("rank"))).reduce(_ unionAll _)
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf").desc, col("doc_id"))
    uni.groupBy("query_id", "doc_id")
      .agg(graft.Tables.dsum(lit(1.0d) / (lit(kConst) + col("rank")),
          scale).as("rrf"),
        count(lit(1)).as("n_lists"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select("query_id", "rank", "doc_id", "rrf", "n_lists")
  }
}
