package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.pipeline.{Ann, Dedup, TextFns}

/** Training-data pipeline operators over documents/embeddings as gate
  * entries. md5-based exact dedup and the text statistics are DuckDB-
  * checked; MinHash/SimHash/LSH outputs depend on Spark's hash functions
  * (not portable) and are registered rows-only, with their semantics
  * covered by PipelineSpec.
  */
object PipelineQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Exact dedup groups over documents (md5 of normalized text). */
  def pExactDedup(s: SparkSession, d: String): DataFrame =
    Dedup.exactGroups(Tables.documents(s, d), "doc_id", "text")
      .orderBy("h")

  /** Token/subword/punct counts + stopword ratio + content hash. */
  def pTextStats(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      TextFns.tokenCount(col("text")).as("n_tokens"),
      TextFns.punctCount(col("text")).as("n_punct"),
      TextFns.stopwordRatio(col("text")).as("stop_ratio"),
      TextFns.contentHash(col("text")).as("chash"))
      .orderBy("doc_id")

  /** Language-ID heuristic (en/de/fr stopword argmax). */
  def pLangId(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      TextFns.languageId(col("text")).as("lang_guess"))
      .orderBy("doc_id")

  /** Quality scores, bucketed (rows-only would hide regressions; the
    * formula is portable arithmetic so it is oracle-checked).
    */
  def pQuality(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      TextFns.qualityScore(col("text")).as("quality"))
      .orderBy("doc_id")

  /** MinHash near-dup candidate pairs (rows-only: Murmur3-dependent).
    * Emits signatures alongside so the row count is stable (one per
    * doc) even when the corpus has no near-dups.
    */
  def pMinhash(s: SparkSession, d: String): DataFrame = {
    val doc = Tables.documents(s, d)
    val sigs = doc.select(col("doc_id"),
      element_at(Dedup.minhashSignature(
        Dedup.shingles(col("text")), 64), 1).as("minhash0"))
    val pairs = Dedup.minhashDedupPairs(doc, "doc_id", "text",
      threshold = 0.8)
      .select(col("id1").as("doc_id"),
        col("id2").cast("long").as("dup_of"))
    sigs.join(pairs.groupBy("doc_id")
        .agg(count(lit(1)).as("n_dups")), Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_dups"))
      .orderBy("doc_id")
  }

  /** SimHash fingerprints + near-dup distances (rows-only). */
  def pSimhash(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"),
      Dedup.simhash(col("text")).as("simhash"),
      TextFns.fingerprint(col("text")).as("fp"))
      .orderBy("doc_id")

  /** Embedding near-dup pairs via hyperplane LSH (rows-only; emits
    * per-vector buckets so rows are stable).
    */
  def pEmbedDup(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    emb.select(col("vec_id"),
      Dedup.hyperplaneBucket(col("embedding").cast("array<double>"), 12)
        .as("bucket"))
      .orderBy("vec_id")
  }

  /** ANN: LSH top-k neighbors for the first 20 vectors (rows-only). */
  def pAnnTopk(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val queries = emb.orderBy("vec_id").limit(20)
    Ann.lshTopK(queries, emb, "vec_id", "vec_id", "embedding",
      k = 5, planes = 4, tables = 8)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
      .orderBy("query_id", "rank")
  }

  /** Brute-force cosine top-3 neighbor IDs for 10 queries — DuckDB-
    * checked (IDs only; scores stay engine-local to avoid float-repr
    * mismatches).
    */
  def pAnnBrute(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val queries = emb.orderBy("vec_id").limit(10)
    Ann.bruteForceTopK(queries, emb, "vec_id", "vec_id", "embedding", k = 3)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
      .orderBy("query_id", "rank")
  }

  /** $llmExtract with the deterministic replay client (the production
    * client swaps in behind the same batch trait). The replay
    * heuristic is a regex, so DuckDB can oracle it exactly.
    */
  def pLlmExtract(s: SparkSession, d: String): DataFrame =
    graft.llm.Llm.extract(Tables.documents(s, d), "text",
      "Extract the amount number mentioned")
      .select(col("doc_id"), col("extracted"))
      .orderBy("doc_id")

  /** Multimodal plumbing over documents (rows-only: the decode is a
    * deterministic stub per the brief; the schema, batched
    * mapPartitions shape, and frame-sampling explode are real).
    */
  def pMultimodal(s: SparkSession, d: String): DataFrame = {
    import graft.pipeline.Multimodal
    val media = Tables.documents(s, d)
      .select(col("doc_id"), Multimodal.packFakeMedia(col("text"))
        .as("media"))
    val feats = Multimodal.extractFeatures(media, "doc_id", "media",
      dim = 8, batch = 64)
    val frames = Multimodal.sampleFrames(media, "doc_id", "media", 5000L)
      .groupBy("doc_id").agg(count(lit(1)).as("n_frames"))
    media.select(col("doc_id"),
        col("media.meta.width").as("width"),
        Multimodal.resizeMeta(col("media"), 64)
          .getField("meta").getField("width").as("resized_w"))
      .join(feats, "doc_id")
      .join(frames, "doc_id")
      .select(col("doc_id"), col("width"), col("resized_w"),
        element_at(col("features"), 1).as("f0"), col("n_frames"))
      .orderBy("doc_id")
  }

  val all: Map[String, Q] = Map(
    "p_multimodal" -> (pMultimodal _),
    "p_llm_extract" -> (pLlmExtract _),
    "p_exact_dedup" -> (pExactDedup _),
    "p_text_stats" -> (pTextStats _),
    "p_lang_id" -> (pLangId _),
    "p_quality" -> (pQuality _),
    "p_minhash" -> (pMinhash _),
    "p_simhash" -> (pSimhash _),
    "p_embed_dup" -> (pEmbedDup _),
    "p_ann_topk" -> (pAnnTopk _),
    "p_ann_brute" -> (pAnnBrute _))

  private val norm =
    """trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"""
  private def swList(ws: Seq[String]) =
    ws.map(w => s"'$w'").mkString("(", ", ", ")")
  private val en = Seq("the", "a", "an", "and", "or", "of", "to", "in",
    "is", "are", "was", "it", "that", "this", "for", "with", "on", "as",
    "at", "by", "be")
  private val de = Seq("der", "die", "das", "und", "oder", "zu", "in",
    "ist", "sind", "war", "es", "dass", "für", "mit", "auf", "als", "bei",
    "ein", "eine", "von", "den")
  private val fr = Seq("le", "la", "les", "et", "ou", "de", "à", "en",
    "est", "sont", "était", "il", "que", "ce", "pour", "avec", "sur",
    "comme", "par", "un", "une", "des")
  private val toks =
    """list_filter(str_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"""
  private def swCount(ws: Seq[String]) =
    s"len(list_filter($toks, x -> x IN ${swList(ws)}))"

  val oracles: Map[String, String] = Map(
    "p_llm_extract" ->
      """SELECT doc_id,
        |  coalesce(regexp_extract(text, '\d+(\.\d+)?'), '') AS extracted
        |FROM documents ORDER BY doc_id""".stripMargin,
    "p_exact_dedup" ->
      s"""SELECT md5($norm) AS h, min(doc_id) AS keep_id,
         |  count(*) AS n_dups
         |FROM documents GROUP BY 1 ORDER BY h""".stripMargin,
    "p_text_stats" ->
      s"""SELECT doc_id,
         |  len(list_filter(str_split_regex(text, '\\s+'), x -> x <> ''))
         |    AS n_tokens,
         |  length(text) - length(regexp_replace(text,
         |    '[.,;:!?''"()\\[\\]{}-]', '', 'g')) AS n_punct,
         |  CASE WHEN len($toks) > 0
         |    THEN CAST(${swCount(en)} AS DOUBLE) / len($toks)
         |    ELSE 0.0 END AS stop_ratio,
         |  md5($norm) AS chash
         |FROM documents ORDER BY doc_id""".stripMargin,
    "p_lang_id" ->
      s"""SELECT doc_id,
         |  CASE
         |    WHEN greatest(${swCount(en)}, ${swCount(de)}, ${swCount(fr)}) = 0
         |      THEN 'und'
         |    WHEN ${swCount(en)} >= ${swCount(de)}
         |      AND ${swCount(en)} >= ${swCount(fr)} THEN 'en'
         |    WHEN ${swCount(de)} >= ${swCount(fr)} THEN 'de'
         |    ELSE 'fr' END AS lang_guess
         |FROM documents ORDER BY doc_id""".stripMargin,
    "p_quality" ->
      s"""SELECT doc_id, round(
         |  least(CAST(n_toks AS DOUBLE) / 100.0, 1.0) * 0.3 +
         |  (CASE WHEN n_toks > 0 AND nc / n_toks BETWEEN 3 AND 12
         |     THEN 1.0 ELSE 0.3 END) * 0.3 +
         |  (CASE WHEN nc = 0 OR np / nc <= 0.1 THEN 1.0 ELSE 0.5 END) * 0.2 +
         |  least(sr * 4, 1.0) * 0.2, 6) AS quality
         |FROM (
         |  SELECT doc_id,
         |    CAST(length(text) AS DOUBLE) AS nc,
         |    CAST(len(list_filter(str_split_regex(text, '\\s+'),
         |      x -> x <> '')) AS DOUBLE) AS n_toks,
         |    CAST(length(text) - length(regexp_replace(text,
         |      '[.,;:!?''"()\\[\\]{}-]', '', 'g')) AS DOUBLE) AS np,
         |    CASE WHEN len($toks) > 0
         |      THEN CAST(${swCount(en)} AS DOUBLE) / len($toks)
         |      ELSE 0.0 END AS sr
         |  FROM documents)
         |ORDER BY doc_id""".stripMargin,
    "p_ann_brute" ->
      """SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(
        |        CAST(q.embedding AS DOUBLE[]),
        |        CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id) AS rank
        |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 10) q
        |  CROSS JOIN embeddings c
        |  WHERE q.vec_id <> c.vec_id)
        |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin)
}
