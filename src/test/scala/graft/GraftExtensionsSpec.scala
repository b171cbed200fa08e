package graft

import org.apache.spark.sql.{Row, SparkSessionExtensions}
import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, TextFns}

/** The SQL surface must resolve to the same expressions as the
  * DataFrame API: register the functions, run both surfaces over the
  * documents table, compare exactly.
  */
class GraftExtensionsSpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftExtensions.registerFunctions(spark)
    Tables.documents(spark, sf("sf0.001"))
      .createOrReplaceTempView("docs")
  }

  test("SQL graft_* functions match the DataFrame expressions") {
    val viaSql = spark.sql(
      """SELECT doc_id, graft_simhash(text) AS fp,
        |  graft_fingerprint(text) AS gfp,
        |  graft_token_count(text) AS n_toks,
        |  graft_lang_id(text) AS lang,
        |  graft_quality(text) AS q,
        |  graft_normalize(text) AS norm
        |FROM docs""".stripMargin)
    val viaDf = Tables.documents(spark, sf("sf0.001")).select(
      col("doc_id"),
      Dedup.simhashMd5(col("text")).as("fp"),
      TextFns.fingerprintMd5(col("text")).as("gfp"),
      TextFns.tokenCount(col("text")).as("n_toks"),
      TextFns.languageId(col("text")).as("lang"),
      TextFns.qualityScore(col("text")).as("q"),
      Dedup.normalize(col("text")).as("norm"))
    assert(viaSql.exceptAll(viaDf).count() == 0)
    assert(viaDf.exceptAll(viaSql).count() == 0)
  }

  test("parameterized SQL functions accept literal knobs") {
    val r = spark.sql(
      """SELECT graft_shingles('one two three four', 2) AS sh,
        |  graft_hamming(graft_simhash('aa bb'), graft_simhash('aa bb'))
        |    AS d,
        |  graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS cos,
        |  size(graft_token_counts('a a b')) AS ntc,
        |  size(graft_minhash_bands('x y z w', 3, 32, 8)) AS nb,
        |  size(graft_hyperplane_buckets(array(1.0d, -1.0d), 4, 2, 2,
        |    42)) AS nhb""".stripMargin).head()
    assert(r.getSeq[String](0) ==
      Seq("one two", "two three", "three four"))
    assert(r.getInt(1) == 0)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
    assert(r.getInt(3) == 2)
    assert(r.getInt(4) == 8)
    assert(r.getInt(5) == 2)
  }

  test("graft_minhash_sig matches the kernel through SQL") {
    val viaSql = spark.sql(
      "SELECT graft_minhash_sig('the quick brown fox jumps', 3, 32)")
      .head().getSeq[Long](0)
    val viaKernel = spark.range(1).select(
        graft.functions.MinhashSignature(
          lit("the quick brown fox jumps"), 3, 32))
      .head().getSeq[Long](0)
    assert(viaSql == viaKernel && viaSql.length == 32)
  }

  test("graft_winnow and graft_zvalue match the library surfaces") {
    val viaSql = spark.sql(
      "SELECT graft_winnow('one two three four five six seven eight " +
        "nine ten eleven twelve', 4, 8) AS f").head().getSeq[Row](0)
    val viaLib = spark.range(1).select(graft.pipeline.Dedup.winnow(
        lit("one two three four five six seven eight nine ten " +
          "eleven twelve"), 4, 8))
      .head().getSeq[Row](0)
    assert(viaSql == viaLib && viaSql.nonEmpty)
    val zSql = spark.sql(
      "SELECT graft_zvalue(5, 9, 0, 15, 0, 15, 4)").head().getLong(0)
    val zLib = spark.range(1).select(graft.sources.Layout.zvalue(
        Seq(lit(5L), lit(9L)), Seq(0L, 0L), Seq(15L, 15L), 4))
      .head().getLong(0)
    assert(zSql == zLib)
  }

  test("graft_dhash / graft_audio_fp match the kernels through SQL") {
    val viaSql = spark.sql(
      "SELECT graft_dhash(CAST('hello media payload' AS BINARY)) AS d, " +
        "graft_audio_fp(CAST('hello media payload' AS BINARY)) AS a")
      .head()
    val viaKernel = spark.range(1).select(
        graft.functions.DHashWords(
          lit("hello media payload").cast("binary")).as("d"),
        graft.functions.AudioFpWords(
          lit("hello media payload").cast("binary")).as("a"))
      .head()
    assert(viaSql.getSeq[Int](0) == viaKernel.getSeq[Int](0))
    assert(viaSql.getSeq[Int](1) == viaKernel.getSeq[Int](1))
    // every word stays a 16-bit value (binEncode's layout contract)
    assert(viaSql.getSeq[Int](0).forall(w => w >= 0 && w < 65536))
    assert(viaSql.getSeq[Int](1).forall(w => w >= 0 && w < 65536))
  }

  test("graft_bigram_counts matches the kernel through SQL") {
    val viaSql = spark.sql(
      "SELECT graft_bigram_counts('a b a b c') AS bc").head()
      .getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1)))
    assert(viaSql == Seq(("a b", 2L), ("b a", 1L), ("b c", 1L)))
  }

  test("graft_video_fp matches the kernel through SQL") {
    val payload = ("scene one text " * 12).trim // > 1 frame at 128
    val viaSql = spark.sql(
      s"SELECT graft_video_fp(CAST('$payload' AS BINARY), 128) AS v")
      .head().getSeq[org.apache.spark.sql.Row](0)
    val viaKernel = spark.range(1).select(
        graft.functions.VideoFpHashes(
          lit(payload).cast("binary"), 128).as("v"))
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(viaSql == viaKernel && viaSql.size == 2)
    // frame_len must be a literal
    val e = intercept[Exception](spark.sql(
      "SELECT graft_video_fp(CAST('x' AS BINARY), id + 1) " +
        "FROM range(1)").collect())
    assert(e.getMessage.contains("literal"))
  }

  test("graft_cosine matches the kernel through SQL") {
    val r = spark.sql("SELECT graft_cosine(array(1.0D, 0.0D), " +
      "array(0.0D, 2.0D)) AS c, graft_cosine(array(1.0D, 2.0D), " +
      "array(2.0D, 4.0D)) AS s").head()
    assert(r.getDouble(0) == 0.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("graft_sentences and graft_sentence_chunks through SQL") {
    val r = spark.sql("SELECT graft_sentence_chunks(" +
      "graft_sentences('a b c. d e! f g h i? j'), 5) AS c").head()
    assert(r.getSeq[Int](0) == Seq(0, 0, 1, 1))
  }

  test("graft_nfc composes through SQL") {
    // literal codepoints, not chr(): Spark's chr() is ASCII-mod-256
    // (chr(769) = chr(1)), unlike DuckDB's codepoint chr()
    val r = spark.sql(
      "SELECT md5(graft_nfc('café')) = " +
        "md5('café') AS same").head()
    assert(r.getBoolean(0))
  }

  test("graft_sample_hash and graft_hist_bin match the DataFrame forms") {
    import org.apache.spark.sql.functions._
    val r = spark.sql(
      """SELECT graft_sample_hash('42') AS h,
        |  graft_sample_hash('42', 7) AS h7,
        |  graft_hist_bin(61.5d, 25.0d) AS b,
        |  graft_hist_bin(-3.0d, 25.0d) AS bneg""".stripMargin).head()
    val viaDf = spark.range(1).select(
      graft.pipeline.Sampling.sampleHash(lit("42"), 42).as("h"),
      graft.pipeline.Sampling.sampleHash(lit("42"), 7).as("h7"),
      graft.pipeline.HistSketch.bin(lit(61.5), 25.0).as("b")).head()
    assert(r.getString(0) == viaDf.getString(0))
    assert(r.getString(1) == viaDf.getString(1))
    assert(r.getLong(2) == viaDf.getLong(2) && r.getLong(2) == 2L)
    assert(r.getLong(3) == 0L) // negative values clamp to bin 0
    // NULL propagates like a normal scalar (not silently bin 0)
    val rn = spark.sql(
      "SELECT graft_hist_bin(CAST(NULL AS DOUBLE), 25.0d) AS b").head()
    assert(rn.isNullAt(0))
  }

  test("graft_chunks and graft_jaccard through SQL") {
    val r = spark.sql(
      """SELECT size(graft_chunks('a b c d e f', 4, 2)) AS nc,
        |  graft_jaccard('one two three four', 'one two three four', 2)
        |    AS j_same,
        |  graft_jaccard('aa bb cc', 'xx yy zz', 2) AS j_none"""
        .stripMargin).head()
    assert(r.getInt(0) == 2)
    assert(r.getDouble(1) == 1.0)
    assert(r.getDouble(2) == 0.0)
  }

  test("graft_redact scrubs PII through SQL") {
    val out = spark.sql(
      "SELECT graft_redact('mail a@b.com or 555-123-4567 ip 1.2.3.4')" +
        " AS t").head().getString(0)
    assert(out == "mail <EMAIL> or <PHONE> ip <IP>")
  }

  test("graft_chunk_hashes SQL == md5 of graft_chunks windows") {
    import spark.implicits._
    GraftExtensions.registerFunctions(spark)
    Seq((1L, "one two three four five six seven eight"))
      .toDF("id", "text").createOrReplaceTempView("chunk_src")
    val viaChunks = spark.sql(
      """SELECT c.idx, c.n_tokens, md5(c.chunk) AS h
        |FROM chunk_src LATERAL VIEW
        |  explode(graft_chunks(text, 3, 1)) AS c""".stripMargin)
      .collect().toSeq
    val viaHashes = spark.sql(
      """SELECT c.idx, c.n_tokens, c.chunk_hash AS h
        |FROM chunk_src LATERAL VIEW
        |  explode(graft_chunk_hashes(text, 3, 1)) AS c""".stripMargin)
      .collect().toSeq
    assert(viaChunks == viaHashes && viaChunks.nonEmpty)
    val sizes = spark.sql(
      "SELECT graft_chunk_sizes(text, 3, 1) AS cs FROM chunk_src")
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(sizes.map(_.getLong(1)) == viaChunks.map(_.getLong(1)))
  }

  test("repetition-signal SQL functions match the DataFrame forms") {
    import spark.implicits._
    GraftExtensions.registerFunctions(spark)
    Seq((1L, "x y z x y z x y z q"), (2L, "a b c"))
      .toDF("id", "text").createOrReplaceTempView("rep_src")
    val sql = spark.sql(
      """SELECT id, graft_dup_gram_frac(text, 3) AS d,
        |  graft_top_token_frac(text) AS t
        |FROM rep_src ORDER BY id""".stripMargin)
      .as[(Long, Double, Double)].collect().toSeq
    val df = spark.table("rep_src").select(col("id"),
        graft.pipeline.TextFns.dupGramFrac(col("text"), 3).as("d"),
        graft.pipeline.TextFns.topTokenFrac(col("text")).as("t"))
      .orderBy("id").as[(Long, Double, Double)].collect().toSeq
    assert(sql == df && sql.head._2 == 0.5)
  }

  test("url-domain SQL matches the DataFrame form") {
    import spark.implicits._
    val viaSql = spark.sql(
      """SELECT graft_url_domain('https://www.Example.ORG/p?q=1') AS a,
        |  graft_url_domain('http://sub.site.co.uk:8080/x') AS b,
        |  graft_url_domain('not a url') AS c""".stripMargin)
      .as[(String, String, String)].head()
    assert(viaSql == (("example.org", "sub.site.co.uk", "")))
  }

  test("quality-margin and bpe-encode SQL match the DataFrame forms") {
    val viaSql = spark.sql(
      """SELECT doc_id, graft_quality_margin(text) AS m,
        |  graft_bpe_encode(text, 't a|ta b|l e|tab le') AS enc
        |FROM docs""".stripMargin)
    val viaDf = Tables.documents(spark, sf("sf0.001")).select(
      col("doc_id"),
      TextFns.linearQualityCol(col("text")).getField("margin").as("m"),
      TextFns.bpeEncode(col("text"),
        Seq(("t", "a"), ("ta", "b"), ("l", "e"), ("tab", "le")))
        .as("enc"))
    assert(viaSql.exceptAll(viaDf).count() == 0)
    assert(viaDf.exceptAll(viaSql).count() == 0)
    // malformed merges error loudly
    val e = intercept[Exception](spark.sql(
      "SELECT graft_bpe_encode('x', 'a b c') AS z").head())
    assert(e.getMessage.contains("left right") ||
      e.getCause != null &&
        e.getCause.getMessage.contains("left right"))
    // unigram encode: same kernel as the DataFrame form
    val uniSql = spark.sql(
      "SELECT graft_unigram_encode(text, 'th|he|ing|tion') AS p FROM docs")
    val uniDf = Tables.documents(spark, sf("sf0.001")).select(
      TextFns.unigramEncode(col("text"),
        Seq("th", "he", "ing", "tion")).as("p"))
    assert(uniSql.exceptAll(uniDf).count() == 0)
    assert(uniDf.exceptAll(uniSql).count() == 0)
  }

  test("gopher, bpe-pairs, and gram-hash SQL match the DataFrame forms") {
    val viaSql = spark.sql(
      """SELECT doc_id, graft_gopher(text, 20).keep AS keep,
        |  graft_bpe_pairs(text, 't a|ta b') AS prs,
        |  graft_gram_hash_seq(text, 8) AS ghs
        |FROM docs""".stripMargin)
    val viaDf = Tables.documents(spark, sf("sf0.001")).select(
      col("doc_id"),
      TextFns.gopherRules(col("text"), minWords = 20)
        .getField("keep").as("keep"),
      graft.functions.BpeAdjPairs(col("text"),
        Seq(("t", "a"), ("ta", "b"))).as("prs"),
      graft.functions.GramHashSeq(col("text"), 8).as("ghs"))
    assert(viaSql.exceptAll(viaDf).count() == 0)
    assert(viaDf.exceptAll(viaSql).count() == 0)
  }

  test("graft_curate_signals matches the fused kernel and its Column " +
      "authorities through SQL") {
    val viaSql = spark.sql(
      """SELECT doc_id, graft_curate_signals(text).quality AS q,
        |  graft_curate_signals(text).key AS k
        |FROM docs""".stripMargin)
    val viaDf = Tables.documents(spark, sf("sf0.001")).select(
      col("doc_id"),
      TextFns.qualityScore(col("text")).as("q"),
      md5(Dedup.normalize(col("text"))).as("k"))
    assert(viaSql.exceptAll(viaDf).count() == 0)
    assert(viaDf.exceptAll(viaSql).count() == 0)
  }

  test("the winnow incremental pair contract is SQL-expressible: " +
      "pure-SQL replay == Dedup.winnowPairsAgainst") {
    // the r14 batch-vs-corpus contract, written by a SQL user from
    // the registered scalar kernel alone: distinct fingerprints per
    // doc, corpus-side boilerplate cap, shared-h join, n_shared >= 2,
    // self-pairs excluded
    val viaSql = spark.sql(
      """WITH corf AS (
        |  SELECT DISTINCT doc_id AS corpus_id, f.h AS h
        |  FROM docs LATERAL VIEW explode(graft_winnow(text, 4, 8)) t AS f
        |), capped AS (
        |  SELECT corpus_id, h FROM (
        |    SELECT corpus_id, h, count(1) OVER (PARTITION BY h) AS n
        |    FROM corf)
        |  WHERE n <= 1000
        |), incf AS (
        |  SELECT DISTINCT doc_id AS new_id, f.h AS h
        |  FROM docs LATERAL VIEW explode(graft_winnow(text, 4, 8)) t AS f
        |  WHERE doc_id % 2 = 1
        |)
        |SELECT new_id, corpus_id, count(1) AS n_shared
        |FROM incf JOIN capped USING (h)
        |WHERE new_id != corpus_id
        |GROUP BY new_id, corpus_id
        |HAVING count(1) >= 2""".stripMargin)
    val docs = Tables.documents(spark, sf("sf0.001"))
    val viaApi = Dedup.winnowPairsAgainst(
      docs.filter(col("doc_id") % 2 === 1), "doc_id",
      docs, "doc_id", "text", k = 4, w = 8, minShared = 2)
    assert(viaSql.exceptAll(viaApi).count() == 0)
    assert(viaApi.exceptAll(viaSql).count() == 0)
    assert(viaApi.count() > 0, "fixture must produce pairs")
  }

  test("integer knobs beyond Int range error instead of truncating") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_fingerprint('abc def', 4294967297)")
        .collect()
    }
    assert(e.getMessage.contains("must fit in an Int"),
      s"expected overflow rejection, got: ${e.getMessage}")
  }

  test("the extensions class wires into SparkSessionExtensions") {
    // construction path spark.sql.extensions uses: must not throw and
    // must register every function + the optimizer rule injection
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
  }
}
