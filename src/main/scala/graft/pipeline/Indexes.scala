package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Persisted retrieval indexes — the write-time artifacts that turn
  * the retrieval family's "at scale this column is precomputed"
  * docstrings into an actual contract.
  *
  * Every search operator in [[Ann]]/[[TextFns]]/[[Dedup]] recomputes
  * its corpus-side representation (sign bits, PQ codes, postings,
  * MinHash band buckets) inside the query plan; that is correct and
  * convenient at test scale, but at 100 TB re-encoding the corpus per
  * query batch is the difference between an index and a scan. This
  * module writes each representation ONCE as a parquet artifact laid
  * out for its probe pattern, and provides query operators that
  * consume the prebuilt frame — RESULT-IDENTICAL to their recompute
  * twins (the p_*_indexed gates hash-match the recompute gates'
  * oracles), with plans containing no encode kernel and no exchange
  * on the corpus side (PlanSpec pins).
  *
  * Layout discipline per family:
  *  - binary ANN: (neighbor_id, cb) — 8 bytes of sign bits per row;
  *    the Hamming scan streams it file-parallel, so plain splittable
  *    parquet is the right layout (no clustering key exists).
  *  - IVF-PQ: (neighbor_id, codes) PARTITIONED BY cent — the probe
  *    join's equi-key is the directory key, so a probed query reads
  *    only its nprobe list directories (partition pruning; with a
  *    broadcast query side Spark's dynamic partition pruning applies
  *    the probe list at runtime).
  *  - BM25 postings: (token, doc_id, tf, dl) repartitioned+sorted by
  *    token (min/max row-group pruning under the pushed `In(token)`
  *    filter) plus write-time dfs/(n_docs, avgdl) side tables.
  *  - MinHash: (id, band, bucket) — the [[Dedup.minhashIndexMd5]]
  *    frame persisted; incremental batches probe it without touching
  *    corpus text except for the Jaccard verify of matched ids.
  *
  * CONCURRENCY CONTRACT (every write and append entry point in this
  * module): SINGLE WRITER per artifact path. The append family lands new parquet
  * files next to the old ones through Spark's file committer — task
  * files stage under `_temporary/` (invisible to readers) and commit
  * by rename at job end, so a probe running CONCURRENTLY with an
  * append sees either none or some complete files of the batch,
  * never partial rows; a writer killed mid-job leaves only staged
  * files readers ignore (re-run the batch). Two concurrent appends
  * to one path can clobber each other's committer bookkeeping —
  * serialize them upstream. Families whose artifact carries
  * corpus-global statistics (BM25's dfs/meta side tables) REBUILD
  * those tables on append rather than appending rows; rewrite-in-
  * place artifacts (the Bloom seen-set) use the
  * [[graft.core.Artifacts]] versioned-pointer lifecycle instead,
  * which additionally survives a kill at any point (CrashSafetySpec).
  */
object Indexes {

  // ---------- binary (1-bit sign) ANN ----------

  /** Write the [[Ann.binEncode]] sign-bit column for a corpus:
    * (neighbor_id, cb array<int>) parquet at `path`. Null embeddings
    * encode to NULL and are excluded at write time (they are
    * unsearchable; [[Ann.binaryTopK]] drops them per query instead).
    */
  def writeBinaryIndex(corpus: DataFrame, cId: String, vecCol: String,
      path: String, dim: Int = 64): Unit =
    // filter on the RAW column (binEncode is NULL iff its input is):
    // an isnotnull on the encoded alias would be alias-substituted
    // below the Project and evaluate the encode tree twice per row —
    // see Ann.binaryTopK's corpus side.
    corpus.filter(col(vecCol).isNotNull)
      .select(col(cId).as("neighbor_id"),
        Ann.binEncode(col(vecCol).cast("array<double>"), dim).as("cb"))
      .write.mode("overwrite").parquet(path)

  def openBinaryIndex(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Append an ingest batch to a [[writeBinaryIndex]] artifact. The
    * binary layout is append-friendly by construction: rows are
    * independent (no per-row statistic depends on the rest of the
    * corpus), so new files land next to the old ones and the next
    * probe scans base+delta with no merge step — the property that
    * makes this index maintainable at warehouse scale, where a
    * rebuild per batch would re-encode the full corpus. (Contrast
    * [[writePostingsIndex]]: BM25's df/avgdl are corpus-global, so a
    * postings append without a stats rebuild would score against
    * stale statistics — that family rebuilds or delta-merges.)
    * Result-identical to a rebuild over base ∪ batch (gate
    * p_ann_index_append hash-matches p_ann_binary's oracle).
    */
  def appendBinaryIndex(batch: DataFrame, cId: String, vecCol: String,
      path: String, dim: Int = 64): Unit =
    batch.filter(col(vecCol).isNotNull)
      .select(col(cId).as("neighbor_id"),
        Ann.binEncode(col(vecCol).cast("array<double>"), dim).as("cb"))
      .write.mode("append").parquet(path)

  /** [[Ann.binaryTopK]] against a prebuilt [[writeBinaryIndex]]
    * frame: the corpus side is the 8-byte-per-row index scan — no
    * encode kernel, no exchange below the probe join — and only the
    * shortlist×dim full vectors are fetched from `vectors` for the
    * exact-cosine re-rank. Bit-identical to the recompute twin.
    *
    * `selfExclude` follows [[Ann.binaryTopKFrom]]'s contract: the
    * default true is the single-corpus self-search posture; callers
    * probing a persisted index with an EXTERNAL query batch whose id
    * space may overlap the corpus's (both 0-based is common) must
    * pass false, or a true neighbor whose id happens to equal the
    * query's is silently dropped from the shortlist
    * (IndexesSpec pins the colliding-id probe).
    */
  def binaryTopKIndexed(queries: DataFrame, index: DataFrame,
      vectors: DataFrame, qId: String, cId: String, vecCol: String,
      k: Int, shortlist: Int = 50, dim: Int = 64,
      selfExclude: Boolean = true): DataFrame =
    Ann.binaryTopKFrom(queries, index, vectors, qId, cId, vecCol,
      k, shortlist, dim, selfExclude)

  /** [[binaryTopKIndexed]] with a POINT-FETCH re-rank — the
    * out-of-cache production shape for interactive probe batches.
    *
    * The single-plan form's re-rank is `shortlist ⋈ vectors`: Spark
    * broadcasts the tiny shortlist and SCANS the whole vectors table,
    * which is invisible while the corpus sits in page cache but makes
    * every probe pay a full-corpus read once it doesn't (the
    * 100 TB regime — embeddings alone outgrow aggregate RAM long
    * before the corpus does). Here the shortlist is materialized
    * first (ONE action over the compact index; |queries| × shortlist
    * rows — driver-bounded by construction, the same contract as the
    * `.collect()`-bounded probe batches everywhere else in this
    * file), and the re-rank reads `vectors` through a pushed
    * `id IN (…)` filter: parquet row-group stats prune every file
    * outside the shortlist's id range, so the fetch reads
    * O(|shortlist|) row groups instead of the corpus. With the
    * corpus written sorted/clustered by id (the natural layout of an
    * id-keyed delivery), that is a handful of footer reads plus the
    * matching pages.
    *
    * Result-identical to [[binaryTopKIndexed]] (IndexesSpec pins
    * both orderings); use the join form for BULK probe batches where
    * |queries| × shortlist stops being driver-sized.
    */
  def binaryTopKIndexedPoint(queries: DataFrame, index: DataFrame,
      vectors: DataFrame, qId: String, cId: String, vecCol: String,
      k: Int, shortlist: Int = 50, dim: Int = 64,
      selfExclude: Boolean = true): DataFrame = {
    require(shortlist >= k, "shortlist must cover k")
    val spark = queries.sparkSession
    val candPlan = Ann.binaryShortlist(queries, index, qId, vecCol,
      shortlist, dim, selfExclude)
    val candRows = candPlan.collect()
    val cand = spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(candRows: _*)),
      candPlan.schema)
    val ids = candRows.map(_.get(1)).distinct.toSeq
    // chunked IN filters of exactly the session's exact-pushdown
    // threshold (graft.Sessions.InFilterThreshold — ONE shared
    // constant, so lowering it can never leave a chunk size above the
    // threshold, where the filter silently degrades to an unpruned
    // min/max range and parquet-mr's nested-Or build overflows the
    // task stack past ~4k values). Chunks are disjoint, so the union
    // needs no dedup.
    val cv =
      if (ids.isEmpty) vectors.filter(lit(false))
        .select(col(cId).as("neighbor_id"),
          col(vecCol).cast("array<double>").as("cv"))
      else ids.grouped(graft.Sessions.InFilterThreshold).map { chunk =>
        vectors.filter(col(cId).isin(chunk: _*))
          .select(col(cId).as("neighbor_id"),
            col(vecCol).cast("array<double>").as("cv"))
      }.reduce(_ union _)
    Ann.rerankShortlist(cand, queries, cv, qId, vecCol, k)
  }

  // ---------- freshness certification ----------

  /** Certify a persisted index against the live corpus WITHOUT
    * re-encoding anything: id-level [[Sampling.shardManifest]]s of
    * the index's id column (8 bytes/row — the cheap scan the artifact
    * was laid out for) and the corpus's id column, diffed per shard
    * ([[Sampling.manifestDiff]] shape: ok = false rows localize the
    * drift). Catches the staleness that actually happens to
    * write-once indexes — rows added/deleted/re-keyed since the
    * write (run the matching append, or rebuild). In-place VECTOR
    * mutation under an unchanged id is outside the contract, as for
    * every content-addressed artifact here: corpora are immutable
    * deliveries, re-keyed on change (p_manifest's certification
    * model). No stored manifest file exists to go stale — both sides
    * compute from live data, so the check stays correct across
    * [[appendBinaryIndex]]/[[appendMinhashIndex]] batches.
    */
  def indexFreshness(index: DataFrame, indexId: String,
      corpus: DataFrame, corpusId: String,
      shards: Int = 16): DataFrame =
    Sampling.manifestDiff(
      idManifest(index, indexId, shards),
      idManifest(corpus, corpusId, shards))

  /** True iff every shard certifies ([[indexFreshness]] all-ok). */
  def isFresh(index: DataFrame, indexId: String, corpus: DataFrame,
      corpusId: String, shards: Int = 16): Boolean =
    indexFreshness(index, indexId, corpus, corpusId, shards)
      .filter(!col("ok")).isEmpty

  private def idManifest(df: DataFrame, id: String,
      shards: Int): DataFrame =
    Sampling.shardManifest(
      df.select(col(id).as("__id"),
        col(id).cast("string").as("__c")),
      "__id", "__c", shards)

  // ---------- IVF-PQ ----------

  /** Write the IVF-PQ layout: (neighbor_id, codes) partitioned by
    * coarse list id `cent` — one directory per inverted list, so a
    * probe reads only its `nprobe` lists. Same seeded centroids /
    * codebooks as [[Ann.ivfPqTopK]]; pass identical parameters at
    * query time (they are the index's schema, not tunables).
    */
  def writeIvfPqIndex(corpus: DataFrame, cId: String, vecCol: String,
      path: String, nCentroids: Int = 16, m: Int = 8, ks: Int = 16,
      dim: Int = 64, seed: Int = 4242, pqSeed: Int = 9090): Unit = {
    val books = Ann.pqBooks(m, ks, dim / m, pqSeed)
    corpus.select(col(cId).as("neighbor_id"),
        Ann.assignCentroid(col(vecCol).cast("array<double>"),
          nCentroids, dim, seed).as("cent"),
        Ann.pqEncode(col(vecCol), books).as("codes"))
      .write.mode("overwrite").partitionBy("cent").parquet(path)
  }

  def openIvfPqIndex(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** [[Ann.ivfPqTopK]] against a prebuilt [[writeIvfPqIndex]] frame:
    * queries explode to their probe lists and broadcast; the corpus
    * side reads (cent, neighbor_id, codes) only — ADC scoring never
    * touches a vector and the scan prunes to the probed list
    * directories. Result-identical to the recompute twin.
    *
    * `pruneLists` (default on) collects the distinct probed list ids
    * to the driver (≤ nCentroids ints — the bm25 query-vocab
    * precedent) and bakes them into the scan as a literal partition
    * filter, so the unprobed list DIRECTORIES are never opened — the
    * point of the layout. The equi-join makes the filter a no-op
    * relationally; pass false to keep plan construction fully lazy.
    */
  def ivfPqTopKIndexed(queries: DataFrame, index: DataFrame,
      qId: String, vecCol: String, k: Int, nCentroids: Int = 16,
      nprobe: Int = 4, m: Int = 8, ks: Int = 16, dim: Int = 64,
      seed: Int = 4242, pqSeed: Int = 9090,
      pruneLists: Boolean = true): DataFrame =
    ivfPqProbe(queries, index, qId, vecCol, k,
      Ann.pqBooks(m, ks, dim / m, pqSeed), nCentroids, nprobe, dim,
      seed, pruneLists, residualBias = false)

  /** Shared probe tail of [[ivfPqTopKIndexed]] and
    * [[ivfPqResTopKIndexed]] — ONE copy of the query explode, the
    * pruneLists partition-filter collect, the self-exclusion, and the
    * tie-ordered top-k window, so a fix to any of them can never
    * leave the twin stale. `residualBias` adds the per-list
    * <q, centroid> term the residual layout's scores decompose with.
    */
  private def ivfPqProbe(queries: DataFrame, index: DataFrame,
      qId: String, vecCol: String, k: Int,
      books: Array[Array[Array[Double]]], nCentroids: Int,
      nprobe: Int, dim: Int, seed: Int, pruneLists: Boolean,
      residualBias: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = books.length
    val ks = books.head.length
    val qBase = queries.select(col(qId).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val qCols = Seq(col("query_id"),
      explode(Ann.probeCentroids(col("qv"), nprobe, nCentroids,
        dim, seed)).as("cent"),
      Ann.pqLut(col("qv"), books).as("lut")) ++
      (if (residualBias)
        Seq(graft.functions.CentroidDots(col("qv"), nCentroids, dim,
          seed).as("cd"))
      else Nil)
    val q = qBase.select(qCols: _*)
    val pruned = if (!pruneLists) index else {
      val probed = q.select("cent").distinct().limit(nCentroids + 1)
        .collect().map(_.get(0))
      index.filter(col("cent").isin(probed.toSeq: _*))
    }
    val adc = Ann.pqAdcScore(col("codes"), col("lut"), m, ks)
    val score = if (residualBias)
      element_at(col("cd"), col("cent") + 1) + adc
    else adc
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    pruned.join(broadcast(q), Seq("cent"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", score)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "score")
  }

  /** Residual IVF-PQ layout ([[Ann.ivfPqResidualTopK]]'s artifact):
    * like [[writeIvfPqIndex]] but the codes quantize vec − centroid
    * (one fused [[graft.functions.ResidualPqCodes]] call per row).
    * The codebooks — trained via [[Ann.pqTrainResidual]] or seeded —
    * are part of the artifact's schema: pass the SAME array at write
    * and probe time.
    */
  def writeIvfPqResIndex(corpus: DataFrame, cId: String,
      vecCol: String, path: String,
      books: Array[Array[Array[Double]]], nCentroids: Int = 16,
      dim: Int = 64, seed: Int = 4242): Unit =
    corpus.select(col(cId).as("neighbor_id"),
        graft.functions.ResidualPqCodes(
          col(vecCol).cast("array<double>"), nCentroids, dim, seed,
          books).as("e"))
      .select(col("neighbor_id"), col("e.cent").as("cent"),
        col("e.codes").as("codes"))
      .write.mode("overwrite").partitionBy("cent").parquet(path)

  /** [[Ann.ivfPqResidualTopK]] against a prebuilt
    * [[writeIvfPqResIndex]] frame: the corpus side reads
    * (cent, neighbor_id, codes) only — no vector, no encode kernel —
    * pruned to the probed list directories; scoring adds the per-list
    * <q, centroid> bias to the shared-LUT residual ADC. Result-
    * identical to the recompute twin.
    */
  def ivfPqResTopKIndexed(queries: DataFrame, index: DataFrame,
      qId: String, vecCol: String, k: Int,
      books: Array[Array[Array[Double]]], nCentroids: Int = 16,
      nprobe: Int = 4, dim: Int = 64, seed: Int = 4242,
      pruneLists: Boolean = true): DataFrame =
    ivfPqProbe(queries, index, qId, vecCol, k, books, nCentroids,
      nprobe, dim, seed, pruneLists, residualBias = true)

  // ---------- BM25 inverted postings ----------

  /** Write the full inverted index for a corpus: `path/postings` =
    * (token, doc_id, tf, dl) repartitioned and sorted by token (the
    * probe key — row groups carry tight token min/max, so the pushed
    * `In(token, …)` filter skips everything else), `path/dfs` =
    * (token, df), `path/stats` = one row (n_docs, avgdl). The dl
    * denormalization (+8 bytes/posting) buys the query path freedom
    * from any doc-length join. Write-time cost is ONE tokenization
    * scan; the per-document length folds over the same TokenCounts
    * array (interpreted HOF — fine once at write, never at query).
    */
  def writePostingsIndex(corpus: DataFrame, idCol: String,
      textCol: String, path: String): Unit = {
    // NOT Caches.stage: this is a write-side utility whose consumers
    // all complete inside this call, so it can (and must) unpersist
    // exactly its own frame on exit. Caches.releaseAll is the
    // HARNESS's between-queries sweep — calling it here would clear
    // every session cache and truncate localCheckpoint lineage a
    // caller's still-unconsumed frames depend on (Caches.scala
    // contract).
    val base = corpus.select(col(idCol).as("doc_id"),
        graft.functions.TokenCounts(col(textCol)).as("tc"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val lens = base.select(col("doc_id"),
        aggregate(col("tc"), lit(0L),
          (acc, t) => acc + t.getField("cnt")).as("dl"))
      lens.agg(count(lit(1)).as("n_docs"),
          (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
        .write.mode("overwrite").parquet(s"$path/stats")
      val postings = base.join(lens, "doc_id")
        .select(col("doc_id"), col("dl"), explode(col("tc")).as("t"))
        .select(col("t.token").as("token"), col("doc_id"),
          col("t.cnt").as("tf"), col("dl"))
      // NB (round 18, measured and kept as-is): "share one token
      // exchange between the dfs aggregate and the postings write"
      // via a repartition(token)+persist was tried and is 2.5×
      // SLOWER (PostingsWriteAb, interleaved medians 1.17 s vs
      // 2.95 s, identical outputs) — the dfs groupBy partial-
      // aggregates map-side, so its exchange carries only the
      // distinct-token partials (KBs), while the "shared" layout
      // pays a full cache materialization of the posting stream.
      // Two logical shuffles here ≠ two stream-sized shuffles.
      postings.groupBy("token").agg(count(lit(1)).as("df"))
        .write.mode("overwrite").parquet(s"$path/dfs")
      postings.repartition(col("token"))
        .sortWithinPartitions("token", "doc_id")
        .write.mode("overwrite").parquet(s"$path/postings")
    } finally base.unpersist(blocking = false)
  }

  /** [[TextFns.bm25Queries]] against a prebuilt [[writePostingsIndex]]
    * artifact: the corpus is never tokenized — the scan reads only
    * postings rows for the query vocabulary (pushed In filter), df
    * and corpus stats come from the write-time side tables, and the
    * scoring/ranking tail is shared code with the recompute twin, so
    * scores are bit-identical.
    */
  def bm25QueriesIndexed(spark: SparkSession, path: String,
      queries: DataFrame, qIdCol: String, termsCol: String,
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 100,
      logIdf: Boolean = true): DataFrame = {
    // shared with bm25Queries (TextFns.queryVocab) so the indexed
    // and recompute paths can never tokenize or bound differently;
    // the literal In list is what reaches the parquet scan as a
    // pushed filter — a join would read every posting row
    val (qt, vocab) = TextFns.queryVocab(queries, qIdCol, termsCol,
      "join against the postings frame directly instead")
    val matched = spark.read.parquet(s"$path/postings")
      .filter(col("token").isin(vocab.toSeq: _*))
    val dfs = spark.read.parquet(s"$path/dfs")
      .filter(col("token").isin(vocab.toSeq: _*))
    val stats = spark.read.parquet(s"$path/stats")
    TextFns.bm25QueryTail(matched, dfs, stats, qt, k1, b, topK, logIdf)
  }

  /** Single-query convenience over [[bm25QueriesIndexed]]. */
  def bm25Indexed(spark: SparkSession, path: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 100, logIdf: Boolean = true): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    import spark.implicits._
    bm25QueriesIndexed(spark,
      path, Seq((0L, terms)).toDF("query_id", "terms"), "query_id",
      "terms", k1, b, topK, logIdf)
      .select("rank", "doc_id", "score", "n_terms")
  }

  // ---------- MinHash band-bucket index ----------

  /** Persist [[Dedup.minhashIndexMd5]]: (id, band, bucket) at `path`.
    * At warehouse scale this is the bucketed+sorted-on-(band, bucket)
    * table [[graft.sources.Bucketing]] describes; plain parquet here
    * keeps the artifact splittable and the probe an equi-join.
    */
  def writeMinhashIndex(corpus: DataFrame, idCol: String,
      textCol: String, path: String, n: Int = 3, k: Int = 32,
      b: Int = 8): Unit =
    Dedup.minhashIndexMd5(corpus, idCol, textCol, n, k, b)
      .write.mode("overwrite").parquet(path)

  def openMinhashIndex(spark: SparkSession, path: String): DataFrame =
    openRecursive(spark, path)

  // ---------- idempotent per-batch appends (ingest loops) ----------

  /** Read an index artifact INCLUDING its `batch_<id>` subdirectories
    * ([[appendBatchDir]]'s layout). recursiveFileLookup disables
    * partition inference — these artifacts are flat schemas, and the
    * mixed files-plus-subdirs layout would otherwise trip partition
    * discovery; underscore-prefixed staging dirs stay hidden.
    */
  private def openRecursive(spark: SparkSession, path: String)
      : DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(path)

  /** Has `batchId` already been folded into the artifact at `path`? */
  def batchApplied(spark: SparkSession, path: String,
      batchId: Long): Boolean = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(new org.apache.hadoop.fs.Path(root, s"batch_$batchId"))
  }

  /** Idempotently fold one micro-batch's rows into a parquet
    * artifact: the rows land as a `batch_<id>` SUBDIRECTORY, written
    * to an underscore-hidden staging dir and published by ONE atomic
    * directory rename. foreachBatch is at-least-once — a batch
    * retried after its append succeeded but before the checkpoint
    * commit would otherwise append its rows a second time, silently
    * diverging the artifact from the sequential-replay authority (and
    * the retried probe, now seeing the batch's own rows, would emit
    * self-candidates the replay never produces) — round-16 ADVICE.
    * With the batch-keyed layout the retry is a no-op (returns
    * false); a crash mid-write leaves only the hidden staging dir,
    * which the next attempt deletes and rewrites. Readers must list
    * recursively ([[openWinnowIndex]]/[[openMinhashIndex]] do).
    */
  private def appendBatchDir(rows: DataFrame, path: String,
      batchId: Long): Boolean = {
    val spark = rows.sparkSession
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(root, s"batch_$batchId")
    if (fs.exists(target)) return false
    val staging =
      new org.apache.hadoop.fs.Path(root, s"_staging_batch_$batchId")
    rows.write.mode("overwrite").parquet(staging.toString)
    fs.rename(staging, target)
    true
  }

  /** [[appendMinhashIndex]] keyed by micro-batch id — the idempotent
    * form ingest loops use; no-op (false) on a replayed batch.
    */
  def appendMinhashIndexBatch(batch: DataFrame, idCol: String,
      textCol: String, path: String, batchId: Long, n: Int = 3,
      k: Int = 32, b: Int = 8): Boolean =
    appendBatchDir(
      Dedup.minhashIndexMd5(batch, idCol, textCol, n, k, b),
      path, batchId)

  /** [[appendWinnowIndex]] keyed by micro-batch id — the idempotent
    * form ingest loops use; no-op (false) on a replayed batch.
    */
  def appendWinnowIndexBatch(batch: DataFrame, idCol: String,
      textCol: String, path: String, batchId: Long, k: Int = 4,
      w: Int = 8): Boolean =
    appendBatchDir(winnowFrame(batch, idCol, textCol, k, w),
      path, batchId)

  /** Idempotently fold a batch's accepted DOCUMENT rows into a
    * corpus-docs artifact (the text side the MinHash ingest loop's
    * Jaccard verify reads). Same batch-keyed layout as the index
    * appends; open with [[openIngestDocs]].
    */
  def appendIngestDocs(rows: DataFrame, path: String,
      batchId: Long): Boolean =
    appendBatchDir(rows, path, batchId)

  def openIngestDocs(spark: SparkSession, path: String): DataFrame =
    openRecursive(spark, path)

  /** Append a batch's band buckets to a [[writeMinhashIndex]]
    * artifact. Signatures are row-local (md5-derived, no corpus
    * statistic), so like [[appendBinaryIndex]] the append is
    * merge-free and probe-equivalent to a rebuild over base ∪ batch
    * — the ingest loop is: probe the index for near-dups of the
    * incoming batch, drop matches, append the survivors.
    */
  def appendMinhashIndex(batch: DataFrame, idCol: String,
      textCol: String, path: String, n: Int = 3, k: Int = 32,
      b: Int = 8): Unit =
    Dedup.minhashIndexMd5(batch, idCol, textCol, n, k, b)
      .write.mode("append").parquet(path)

  /** [[Dedup.incrementalDupPairsMd5]] probing a prebuilt
    * [[writeMinhashIndex]] frame: only the incoming batch computes
    * signatures; the corpus contributes its persisted band buckets
    * (capped at probe time — the skew guard is a query knob, not
    * baked into the artifact) and text for the Jaccard verify of
    * matched ids only.
    */
  def incrementalDupPairsIndexed(incoming: DataFrame, incId: String,
      index: DataFrame, corpus: DataFrame, corId: String,
      textCol: String, n: Int = 3, k: Int = 32, b: Int = 8,
      threshold: Double = 0.8, maxBucket: Int = 1000): DataFrame =
    Dedup.incrementalDupPairsFromIndex(incoming, incId, index,
      corpus, corId, textCol, n, k, b, threshold, maxBucket)

  // ---------- Winnowed fingerprint index ----------

  /** Persist [[Dedup.winnow]] fingerprints: distinct (id, h) sorted
    * by h. Winnowing is the reason this index is AFFORDABLE — the
    * expected 2/(w+1) selection density stores ~(w+1)/2× fewer rows
    * than the all-grams frame [[Dedup.dupSpans]] scans, while keeping
    * the ≥ w+k−1-token match guarantee. The h-sorted layout is what
    * [[winnowCandidatesIndexed]]'s pushed In filter prunes against
    * (row-group min/max on h). Fingerprints are row-local, so the
    * append is merge-free and probe-equivalent to a rebuild (the
    * [[appendBinaryIndex]] argument).
    */
  def writeWinnowIndex(corpus: DataFrame, idCol: String,
      textCol: String, path: String, k: Int = 4, w: Int = 8): Unit =
    winnowFrame(corpus, idCol, textCol, k, w)
      .repartitionByRange(col("h"))
      .sortWithinPartitions("h")
      .write.mode("overwrite").parquet(path)

  def openWinnowIndex(spark: SparkSession, path: String): DataFrame =
    openRecursive(spark, path)

  def appendWinnowIndex(batch: DataFrame, idCol: String,
      textCol: String, path: String, k: Int = 4, w: Int = 8): Unit =
    winnowFrame(batch, idCol, textCol, k, w)
      .write.mode("append").parquet(path)

  private def winnowFrame(df: DataFrame, idCol: String,
      textCol: String, k: Int, w: Int): DataFrame =
    // per-row array_distinct ≡ the old global `.distinct()` on
    // (id, h): ids are unique per input row (the index contract), so
    // duplicate (id, h) pairs can only arise WITHIN one document's
    // fingerprint array — dedup in the projection and the distinct's
    // whole exchange disappears (round 18, guide §2.4)
    df.select(col(idCol).as("id"),
        explode(array_distinct(transform(
          Dedup.winnow(col(textCol), k, w),
          f => f.getField("h")))).as("h"))

  /** Near-dup candidates of an incoming batch against a prebuilt
    * [[writeWinnowIndex]] artifact: (batch_id, corpus_id, n_shared =
    * distinct shared fingerprints ≥ `minShared`). Only the batch
    * fingerprints at probe time; the corpus side is a 16-byte-row
    * scan pruned by the batch's fingerprint set. Two result-identical
    * pruning strategies, auto-selected by the batch's distinct
    * fingerprint count (ONE count over the staged frame):
    *
    *  - ≤ `maxProbeFps`: the set becomes a literal pushed In filter
    *    (the [[bm25QueriesIndexed]] discipline) — row-group min/max
    *    pruning on the h-sorted layout, no shuffle of the index.
    *  - above it: a left-semi join prunes instead (a multi-hundred-
    *    thousand-literal In list would bloat the plan past what
    *    codegen tolerates); large batches amortize the shuffle.
    *
    * The boilerplate cap applies at probe time on the TRUE per-h
    * corpus counts — both prunings keep whole h-groups, so the
    * window counts are exact either way.
    */
  def winnowCandidatesIndexed(batch: DataFrame, batchId: String,
      textCol: String, index: DataFrame, k: Int = 4, w: Int = 8,
      minShared: Int = 2, maxBucket: Int = 1000,
      maxProbeFps: Int = 65536): DataFrame = {
    val bf = graft.core.Caches.stage(
      winnowFrame(batch, batchId, textCol, k, w)
        .withColumnRenamed("id", "bid"))
    // ONE action sizes AND fetches the probe set (round 18): collect
    // the distinct fingerprints capped at maxProbeFps + 1 — an
    // overflowing row proves the set is too big for a literal In
    // list without a separate count job
    val probeHs = bf.select("h").distinct()
      .limit(maxProbeFps + 1).collect().map(_.getLong(0))
    val pruned =
      if (probeHs.length <= maxProbeFps)
        index.filter(col("h").isin(probeHs.toSeq: _*))
      else
        index.join(bf.select("h").distinct(), Seq("h"), "leftsemi")
    val capped = pruned
      .withColumn("__n", count(lit(1)).over(Window.partitionBy("h")))
      .filter(col("__n") <= maxBucket).drop("__n")
    bf.join(capped, "h")
      .groupBy(col("bid").as("batch_id"), col("id").as("corpus_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  // ---------- Media fingerprint index (image dHash / audio FP) ----------

  /** Persist media perceptual signatures for pigeonhole probing: one
    * row per (id, signature word) with `key` = word_index·2^16 +
    * word_value (one int, 0..262143) and the full 4-word signature
    * alongside for the popcount verify, key-sorted so probes push a
    * literal In(key) against row-group min/max. A pair at Hamming ≤ 3
    * must agree EXACTLY on some word ([[Multimodal.imageDupPairs]]'s
    * pigeonhole argument), so the probe misses nothing. Signatures
    * are row-local (no corpus statistic), so [[appendMediaIndex]] is
    * merge-free and probe-equivalent to a rebuild — the
    * [[appendBinaryIndex]] argument. At 100 TB this is the difference
    * between scanning 20 bytes/media row and re-decoding the corpus
    * per ingest batch.
    *
    * @param kernel "dhash" (image) or "audio" — the index bakes the
    *        kernel in; probe with the same one
    */
  def writeMediaIndex(corpus: DataFrame, idCol: String,
      mediaCol: String, path: String, kernel: String = "dhash"): Unit =
    mediaSigFrame(corpus, idCol, mediaCol, kernel)
      .repartitionByRange(col("key"))
      .sortWithinPartitions("key")
      .write.mode("overwrite").parquet(path)

  def openMediaIndex(spark: SparkSession, path: String): DataFrame =
    openRecursive(spark, path)

  def appendMediaIndex(batch: DataFrame, idCol: String,
      mediaCol: String, path: String, kernel: String = "dhash"): Unit =
    mediaSigFrame(batch, idCol, mediaCol, kernel)
      .write.mode("append").parquet(path)

  /** [[appendMediaIndex]] keyed by micro-batch id — the idempotent
    * form the media ingest loop uses; no-op (false) on a replayed
    * batch ([[appendBatchDir]]'s exactly-once contract).
    */
  def appendMediaIndexBatch(batch: DataFrame, idCol: String,
      mediaCol: String, path: String, batchId: Long,
      kernel: String = "dhash"): Boolean =
    appendBatchDir(mediaSigFrame(batch, idCol, mediaCol, kernel),
      path, batchId)

  private def mediaSigFrame(df: DataFrame, idCol: String,
      mediaCol: String, kernel: String): DataFrame = {
    val data = col(s"$mediaCol.data")
    val sig = kernel match {
      case "dhash" => graft.functions.DHashWords(data)
      case "audio" => graft.functions.AudioFpWords(data)
      case other => throw new IllegalArgumentException(
        s"unknown media kernel '$other' (want dhash or audio)")
    }
    // filter the RAW payload, not the signature alias: pushdown
    // substitutes an alias filter below the Project and re-evaluates
    // the kernel per row (the binaryTopK deferred-eval lesson). The
    // explode runs over a LITERAL position sequence, not the signature
    // array — InferFiltersFromGenerate's size()>0/isnotnull inferences
    // then constant-fold instead of dragging the kernel into a filter
    // below the Project (3 evals/row, caught by the plan pin).
    df.filter(data.isNotNull)
      .select(col(idCol).as("id"), sig.as("dh"))
      .select(col("id"), col("dh"),
        explode(sequence(lit(0), lit(3))).as("w"))
      .select(col("id"), col("dh"),
        (col("w") * 65536 + element_at(col("dh"), col("w") + 1))
          .as("key"))
  }

  /** Near-dup pairs of an incoming media batch against a prebuilt
    * [[writeMediaIndex]] artifact: (batch_id, corpus_id, dist) with
    * Hamming dist ≤ `maxHamming`. Only the batch decodes/hashes at
    * probe time; the corpus side is the 20-byte-row index scan pruned
    * by the batch's key set — literal pushed In under `maxProbeKeys`
    * distinct keys (≤ 4·|batch|), left-semi join above it (the
    * [[winnowCandidatesIndexed]] auto-selection, result-identical
    * both ways). The `maxBucket` skew cap applies to the TRUE per-key
    * corpus counts of the matched keys (whole key-groups survive
    * either pruning, so the window counts are exact).
    *
    * @param excludeSameId drop pairs whose ids coincide — the ingest
    *        re-probe case where the batch is already indexed
    */
  def mediaDupPairsIndexed(batch: DataFrame, batchId: String,
      mediaCol: String, index: DataFrame, kernel: String = "dhash",
      maxHamming: Int = 3, maxBucket: Int = 1000,
      // 4 keys per media row means batches cross into
      // giant-literal-In territory far sooner than winnow's sparse
      // fingerprints: measured at 20k keys the literal plan costs
      // 2.8x the semi-join (tools/MediaProbeAb), so the literal path
      // is reserved for genuinely small ingest batches
      maxProbeKeys: Int = 4096,
      excludeSameId: Boolean = true): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 4,
      s"pigeonhole probing over 4 words needs maxHamming < 4, " +
        s"got $maxHamming")
    val bf = graft.core.Caches.stage(
      mediaSigFrame(batch, batchId, mediaCol, kernel)
        .withColumnRenamed("id", "bid")
        .withColumnRenamed("dh", "bdh"))
    val nKeys = bf.select("key").distinct().count()
    val pruned =
      if (nKeys <= maxProbeKeys) {
        val keys = bf.select("key").distinct()
          .collect().map(_.getInt(0))
        index.filter(col("key").isin(keys.toSeq: _*))
      } else
        index.join(bf.select("key").distinct(), Seq("key"), "leftsemi")
    val capped = pruned
      .withColumn("__n", count(lit(1)).over(Window.partitionBy("key")))
      .filter(col("__n") <= maxBucket).drop("__n")
    bf.join(capped, "key")
      .filter(if (excludeSameId) col("bid") =!= col("id") else lit(true))
      // a pair can match on several words; collapse before the verify
      .select(col("bid").as("batch_id"), col("id").as("corpus_id"),
        col("bdh"), col("dh"))
      .distinct()
      .select(col("batch_id"), col("corpus_id"),
        Ann.hammingWords(col("bdh"), col("dh")).as("dist"))
      .filter(col("dist") <= maxHamming)
  }
}
