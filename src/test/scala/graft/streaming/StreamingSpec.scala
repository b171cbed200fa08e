package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.functions.col
import java.sql.Timestamp

case class GEvent(ts: Timestamp, event_type: String, value: Double)
case class GDoc(ts: Timestamp, doc_id: Long, text: String)

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("watermarked hourly rollup aggregates tumbling windows") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[GEvent]
    input.addData(
      GEvent(t("2026-01-01 10:05:00"), "click", 1.0),
      GEvent(t("2026-01-01 10:45:00"), "click", 2.0),
      GEvent(t("2026-01-01 11:05:00"), "view", 5.0))
    val q = EventStreams.hourlyRollup(input.toDF())
      .writeStream.format("memory").queryName("rollup")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("rollup")
      .orderBy("hour_start", "event_type")
      .select("event_type", "n", "sum_value")
      .as[(String, Long, Double)].collect().toSeq
    assert(rows == Seq(("click", 2L, 3.0), ("view", 1L, 5.0)))
  }

  test("reduceByKey stream equals the batch keyed fold per window") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions.lit
    val input = MemoryStream[GEvent]
    // non-commutative fold (acc*2 + x) so a wrong fold ORDER flips
    // the result: sorted values 1,2,4 → seed 1, 1*2+2=4, 4*2+4=12
    input.addData(
      GEvent(t("2026-01-01 10:05:00"), "a", 4.0),
      GEvent(t("2026-01-01 10:15:00"), "a", 1.0),
      GEvent(t("2026-01-01 10:25:00"), "a", 2.0),
      GEvent(t("2026-01-01 10:35:00"), "b", 5.0),
      GEvent(t("2026-01-01 11:05:00"), "a", 7.0))
    val q = EventStreams.reduceByKeyStream(input.toDF(), "event_type",
        "value", (acc, x) => acc * lit(2.0) + x)
      .writeStream.format("memory").queryName("rbk")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("rbk")
      .orderBy("window_start", "event_type")
      .select("event_type", "value")
      .as[(String, Double)].collect().toSeq
    assert(rows == Seq(("a", 12.0), ("b", 5.0), ("a", 7.0)), rows)
    // the bounded-window pin against the BATCH operator: the 10:00
    // window's slice through the language-surface $reduceByKey
    val df10 = Seq(("a", 4.0), ("a", 1.0), ("a", 2.0), ("b", 5.0))
      .toDF("k", "n")
    val batch = graft.lang.RM.queryFrame(
        "$reduceByKey($frame, 'k', function($a, $x) { $a * 2 + $x })",
        spark, Map("frame" -> df10))
      .orderBy("k").as[(String, Double)].collect().toSeq
    assert(batch == rows.take(2), (batch, rows))
  }

  test("bloom novelty stream equals the batch novel() over the union of batches") {
    implicit val ctx = spark.sqlContext
    val baseKeys = (0 until 120).map(i => s"seen-url-$i")
    val seen = graft.pipeline.SeenSet.build(
      baseKeys.toDF("k"), "k", mBits = 4096, nHashes = 4, nShards = 2)
    val input = MemoryStream[GDoc]
    // two micro-batches, mixing seen and new keys
    input.addData((0 until 30).map(i =>
      GDoc(t("2026-01-01 10:00:00"), i.toLong, s"seen-url-$i")): _*)
    input.addData((0 until 30).map(i =>
      GDoc(t("2026-01-01 10:01:00"), 100L + i, s"new-url-$i")): _*)
    val q = EventStreams.novelStream(input.toDF(), "text", seen)
      .writeStream.format("memory").queryName("novelout")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("novelout").select("doc_id")
      .as[Long].collect().toSet
    val batchAll = (0 until 30).map(i => (i.toLong, s"seen-url-$i")) ++
      (0 until 30).map(i => (100L + i, s"new-url-$i"))
    val batch = graft.pipeline.SeenSet.novel(
        batchAll.toDF("doc_id", "text"), "text", seen)
      .select("doc_id").as[Long].collect().toSet
    assert(got == batch)
    // and the filter did its job: every surviving key is genuinely new
    assert(got.forall(_ >= 100L))
  }

  test("stream-stream interval join bounds state by event time") {
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[GEvent]
    val imps = MemoryStream[GEvent]
    imps.addData(
      GEvent(t("2026-01-01 10:00:00"), "a", 0.0),
      GEvent(t("2026-01-01 10:00:00"), "b", 0.0))
    clicks.addData(
      GEvent(t("2026-01-01 10:05:00"), "a", 1.0), // within 15 min of imp
      GEvent(t("2026-01-01 11:00:00"), "b", 2.0)) // too late to attribute
    val joined = EventStreams.intervalJoin(
      imps.toDF(), clicks.toDF(), "event_type")
    val q = joined.select(org.apache.spark.sql.functions.col("l.event_type"))
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("attrib").as[String].collect().toSeq == Seq("a"))
  }

  test("stream-static enrichment broadcasts the dimension") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[GEvent]
    input.addData(GEvent(t("2026-01-01 10:00:00"), "click", 1.0))
    val dim = Seq(("click", "interaction"), ("view", "passive"))
      .toDF("event_type", "category")
    val q = EventStreams.enrich(input.toDF(), dim, "event_type")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("enriched").select("event_type", "category")
      .as[(String, String)].collect().toSeq
    assert(rows == Seq(("click", "interaction")))
  }

  test("stateless curation projections run under readStream") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[GDoc]
    input.addData(
      GDoc(t("2026-01-01 10:00:00"), 1L,
        "the quick brown fox is a good document mail me at a@b.com"))
    val q = EventStreams.curateStream(input.toDF())
      .writeStream.format("memory").queryName("curated")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val r = spark.table("curated").head()
    assert(r.getAs[String]("lang_guess") == "en")
    assert(r.getAs[Double]("quality") > 0)
    assert(r.getAs[String]("clean_text").contains("<EMAIL>"))
    assert(r.getAs[String]("chash").length == 32)
  }

  test("html extraction stream matches the batch operator") {
    implicit val ctx = spark.sqlContext
    val html = "<html><head><style>x{}</style></head><body>" +
      "<h1>Title</h1><p>windows are &amp; good</p></body></html>"
    val input = MemoryStream[(Long, String, String)]
    input.addData((1L, html,
      "HTTP://Ex.com:80/a//b/?utm_source=x&z=1#f"))
    val vocab = Seq("title", "wind", "##ow", "##s", "are", "good")
    val q = EventStreams.extractStream(input.toDF()
        .toDF("doc_id", "html", "url"), wpVocab = vocab,
        urlCol = Some("url"))
      .writeStream.format("memory").queryName("extracted")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val r = spark.table("extracted").head()
    assert(r.getAs[String]("text") == "Title\nwindows are & good")
    assert(r.getAs[Long]("n_tokens") == 5L)
    assert(r.getAs[String]("canon_url") == "http://ex.com/a/b?z=1")
    assert(r.getAs[String]("domain") == "ex.com")
    // batch twin on the same row: identical values
    val b = EventStreams.extractStream(
      Seq((1L, html)).toDF("doc_id", "html"), wpVocab = vocab).head()
    // batch twin without a url column: no canon columns appear
    assert(b.getAs[String]("text") ==
      r.getAs[String]("text"))
    assert(b.getAs[Int]("n_pieces") == r.getAs[Int]("n_pieces"))
    // wordpiece accounting saw the ## continuations: windows = 3
    // pieces, the rest one each + [UNK] for the '&'
    assert(r.getAs[Int]("n_pieces") ==
      Seq((1L, html)).toDF("doc_id", "html")
        .select(graft.pipeline.TextFns.wordpieceEncode(
          graft.pipeline.TextFns.htmlToText(col("html")), vocab))
        .head.getSeq[String](0).size)
  }

  test("lm scoring stream matches the batch cross-entropy") {
    implicit val ctx = spark.sqlContext
    val ref = Seq((10L, "the quick brown fox jumps the fence"),
      (11L, "the lazy dog sleeps by the quick river"))
      .toDF("doc_id", "text")
    val (vocab, total) =
      graft.pipeline.Importance.trainUnigram(ref, "text", 32)
    val input = MemoryStream[GDoc]
    input.addData(
      GDoc(t("2026-01-01 10:00:00"), 1L, "the quick brown fox"),
      GDoc(t("2026-01-01 10:01:00"), 2L, "völlig anderes vokabular"))
    val q = EventStreams.lmScoreStream(input.toDF(), vocab, total)
      .writeStream.format("memory").queryName("lmscored")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("lmscored")
      .select("doc_id", "cross_entropy")
      .as[(Long, Double)].collect().toMap
    // the in-vocab doc scores strictly lower than the all-OOV doc
    assert(got(1L) < got(2L), got.toString)
    // twin property: identical to the batch operator's values
    val batch = graft.pipeline.Importance.unigramCrossEntropy(
        Seq((1L, "the quick brown fox"),
          (2L, "völlig anderes vokabular")).toDF("doc_id", "text"),
        ref, "doc_id", "text", vocabSize = 32)
      .select("doc_id", "cross_entropy")
      .as[(Long, Double)].collect().toMap
    assert(got == batch)
  }

  test("pca projection stream matches the batch projections") {
    implicit val ctx = spark.sqlContext
    // train on the batch fixture, stream a subset of the same vectors
    val emb = graft.Tables.embeddings(spark, sf())
    val model = graft.pipeline.Pca.fit(emb, "embedding", 64)
    val rows = emb.orderBy("vec_id").limit(5)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().toSeq
    val input = MemoryStream[(Long, Array[Float])]
    input.addData(rows: _*)
    val q = EventStreams.pcaScoreStream(
        input.toDF().toDF("vec_id", "embedding"), model)
      .writeStream.format("memory").queryName("pcascored")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("pcascored").select("vec_id", "proj")
      .as[(Long, Double)].collect().toMap
    val batch = emb.orderBy("vec_id").limit(5)
      .select($"vec_id",
        graft.pipeline.Pca.project($"embedding", model).as("p"))
      .as[(Long, Double)].collect().toMap
    assert(got == batch)
  }

  test("dsir scoring stream matches the batch importance weights") {
    implicit val ctx = spark.sqlContext
    val corpus = Seq(
      (10L, "the quick brown fox jumps the fence", "en"),
      (11L, "der hund springt über den zaun heute", "de"),
      (12L, "the lazy dog sleeps by the quick river", "en"))
      .toDF("doc_id", "text", "lang")
    val ratios = graft.pipeline.Importance.trainDsir(
      corpus, col("lang") === "en", "text", dim = 64, gram = 2)
    val input = MemoryStream[GDoc]
    input.addData(
      GDoc(t("2026-01-01 10:00:00"), 1L, "the quick brown fox"),
      GDoc(t("2026-01-01 10:01:00"), 2L, "der hund springt heute"))
    val q = EventStreams.dsirScoreStream(input.toDF(), ratios)
      .writeStream.format("memory").queryName("dsirscored")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("dsirscored")
      .select("doc_id", "score_fix")
      .as[(Long, Long)].collect().toMap
    // the target-like doc outscores the off-target doc
    assert(got(1L) > got(2L), got.toString)
    // twin property: identical exact scores to the batch scorer under
    // the same trained model
    val batch = graft.pipeline.Importance.scoreDsir(
        Seq((1L, "the quick brown fox"),
          (2L, "der hund springt heute")).toDF("doc_id", "text"),
        ratios, "doc_id", "text", gram = 2)
      .select("doc_id", "score_fix")
      .as[(Long, Long)].collect().toMap
    assert(got == batch)
  }

  test("lang-id stream matches the batch model predictions") {
    implicit val ctx = spark.sqlContext
    val corpus = Seq(
      (10L, "the cat sat on the mat and the dog ran there", "en"),
      (11L, "der hund sitzt auf dem baum und der hund läuft", "de"))
      .toDF("doc_id", "text", "lang")
    val langs = Seq("de", "en")
    val m = graft.pipeline.Importance.trainLangId(
      corpus, "lang", "text", langs, dim = 64, gram = 3)
    val input = MemoryStream[GDoc]
    input.addData(
      GDoc(t("2026-01-01 10:00:00"), 1L, "the cat and the dog sat"),
      GDoc(t("2026-01-01 10:01:00"), 2L, "der hund und der baum"))
    val q = EventStreams.langIdStream(input.toDF(), m, langs)
      .writeStream.format("memory").queryName("langids")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("langids")
      .select("doc_id", "pred_lang", "lang_score_fix")
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L)._1 == "en" && got(2L)._1 == "de", got.toString)
    // twin property: identical predictions and exact scores
    val batch = graft.pipeline.Importance.langIdModel(
        Seq((1L, "the cat and the dog sat"),
          (2L, "der hund und der baum")).toDF("doc_id", "text"),
        m, langs, "doc_id", "text", dim = 64, gram = 3)
      .select("doc_id", "pred_lang", "score_fix")
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == batch)
  }

  test("incremental cms stream equals the batch sketch (additivity)") {
    implicit val ctx = spark.sqlContext
    val d1 = Seq(
      GDoc(t("2026-01-01 10:00:00"), 1L, "apple apple banana"),
      GDoc(t("2026-01-01 10:01:00"), 2L, "apple cherry"))
    val d2 = Seq(
      GDoc(t("2026-01-01 10:02:00"), 3L, "banana banana cherry date"))
    val input = MemoryStream[GDoc]
    val q = EventStreams.cmsStream(input.toDF(), depth = 3, width = 16)
      .writeStream.format("memory").queryName("cmscells")
      .outputMode("complete").start()
    input.addData(d1: _*); q.processAllAvailable()
    input.addData(d2: _*); q.processAllAvailable()
    q.stop()
    val got = spark.table("cmscells")
      .select("row", "col", "cnt")
      .as[(Int, Long, Long)].collect().toSet
    val batch = graft.pipeline.CountMin.build(
        (d1 ++ d2).toDF(), "text", depth = 3, width = 16)
      .as[(Int, Long, Long)].collect().toSet
    assert(got == batch)
    // the state bound: never more than depth × width cells
    assert(got.size <= 3 * 16)
  }

  test("incremental histogram stream equals the batch sketch") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val d1 = Seq(
      GEvent(t("2026-01-01 10:00:00"), "click", 12.0),
      GEvent(t("2026-01-01 10:01:00"), "click", 61.5),
      GEvent(t("2026-01-01 10:02:00"), "view", 30.0))
    val d2 = Seq(
      GEvent(t("2026-01-01 10:03:00"), "click", 12.5),
      GEvent(t("2026-01-01 10:04:00"), "view", 99.9))
    val input = MemoryStream[GEvent]
    val q = EventStreams.histStream(input.toDF(), "event_type",
        "value", width = 25.0)
      .writeStream.format("memory").queryName("histcells")
      .outputMode("complete").start()
    input.addData(d1: _*); q.processAllAvailable()
    input.addData(d2: _*); q.processAllAvailable()
    q.stop()
    val got = spark.table("histcells")
      .as[(String, Long, Long)].collect().toSet
    val batch = graft.pipeline.HistSketch.build(
        (d1 ++ d2).toDF(), "event_type", "value", 25.0)
      .as[(String, Long, Long)].collect().toSet
    assert(got == batch)
  }

  test("streaming strict packing equals the batch fill, O(1) state") {
    implicit val ctx = spark.sqlContext
    import graft.streaming.EventStreams.ChunkIn
    // chunker output for a small corpus, split across two micro-batches
    // in doc order (the stream==batch precondition)
    val docs = spark.read
      .parquet(s"${sf("sf0.001")}/documents.parquet").limit(60)
    val chunks = docs
      .select(col("doc_id"), org.apache.spark.sql.functions.explode(
        graft.functions.ChunkSizes(col("text"), 32, 0)).as("c"))
      .select(col("doc_id"), col("c.idx").as("idx"),
        col("c.n_tokens").as("n_tokens"),
        (col("doc_id") % 8).cast("int").as("shard"))
      .as[ChunkIn].collect().sortBy(c => (c.doc_id, c.idx))
    val (b1, b2) = chunks.splitAt(chunks.length / 2)
    val input = MemoryStream[ChunkIn]
    val q = EventStreams.packStream(input.toDS(), capacity = 80)
      .writeStream.format("memory").queryName("packed")
      .outputMode("append").start()
    input.addData(b1.toSeq: _*); q.processAllAvailable()
    input.addData(b2.toSeq: _*); q.processAllAvailable()
    q.stop()
    val got = spark.table("packed")
      .select("doc_id", "idx", "shard", "bin")
      .as[(Long, Long, Int, Long)].collect().toSet
    val batch = graft.pipeline.TextFns.assembleBatchesStrict(
        docs, "doc_id", "text", window = 32, capacity = 80,
        shards = 8, bySize = false)
      .select("doc_id", "idx", "shard", "bin")
      .as[(Long, Long, Int, Long)].collect().toSet
    assert(got == batch, "stream must equal the batch next-fit")
  }

  test("packStream rejects a chunk larger than the capacity") {
    implicit val ctx = spark.sqlContext
    import graft.streaming.EventStreams.ChunkIn
    val input = MemoryStream[ChunkIn]
    val q = EventStreams.packStream(input.toDS(), capacity = 10)
      .writeStream.format("memory").queryName("packed_oversize")
      .outputMode("append").start()
    input.addData(ChunkIn(1L, 0L, 99L, 0))
    val e = intercept[org.apache.spark.sql.streaming
      .StreamingQueryException] {
      q.processAllAvailable()
    }
    q.stop()
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: chain(t.getCause)
    assert(chain(e).exists(m => m != null &&
      m.contains("strict packing cannot hold it")), chain(e))
  }

  test("streaming checks equal the batch report as data arrives") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    import graft.pipeline.Checks._
    val suite = Seq(MinRows(3), NotNull("text"),
      InRange("doc_id", 0, 100))
    val d1 = Seq(GDoc(t("2026-01-01 10:00:00"), 1L, "ok"),
      GDoc(t("2026-01-01 10:01:00"), 200L, "out of range"))
    val d2 = Seq(GDoc(t("2026-01-01 10:02:00"), 2L,
      null.asInstanceOf[String]))
    val input = MemoryStream[GDoc]
    val q = EventStreams.checksStream(input.toDF(), suite)
      .writeStream.format("memory").queryName("checksrep")
      .outputMode("complete").start()
    input.addData(d1: _*); q.processAllAvailable()
    input.addData(d2: _*); q.processAllAvailable()
    q.stop()
    val got = spark.table("checksrep")
      .as[(String, Long, Boolean)].collect().toSet
    val batch = graft.pipeline.Checks.run((d1 ++ d2).toDF(), suite)
      .as[(String, Long, Boolean)].collect().toSet
    assert(got == batch)
    assert(got == Set(("min_rows_3", 3L, true),
      ("not_null_text", 1L, false),
      ("in_range_doc_id_0_100", 1L, false)))
    intercept[IllegalArgumentException] {
      EventStreams.checksStream(input.toDF(), Seq(Unique("doc_id")))
    }
  }

  test("streamed value counts feed the same drift report as batch") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val refDocs = Seq((1L, "en"), (2L, "en"), (3L, "de"))
      .toDF("doc_id", "lang")
    val d1 = Seq(GDoc(t("2026-01-01 10:00:00"), 10L, "en"))
    val d2 = Seq(GDoc(t("2026-01-01 10:01:00"), 11L, "fr"),
      GDoc(t("2026-01-01 10:02:00"), 12L, "fr"))
    val input = MemoryStream[GDoc]
    // the GDoc `text` column carries the lang value for this test
    val q = graft.pipeline.Drift.valueCounts(
        input.toDF().withColumnRenamed("text", "lang"), Seq("lang"))
      .writeStream.format("memory").queryName("langcounts")
      .outputMode("complete").start()
    input.addData(d1: _*); q.processAllAvailable()
    input.addData(d2: _*); q.processAllAvailable()
    q.stop()
    val viaStream = graft.pipeline.Drift.l1FromCounts(
        graft.pipeline.Drift.valueCounts(refDocs, Seq("lang")),
        spark.table("langcounts"))
      .collect().head
    val curDocs = Seq((10L, "en"), (11L, "fr"), (12L, "fr"))
      .toDF("doc_id", "lang")
    val viaBatch = graft.pipeline.Drift.l1Drift(refDocs, curDocs,
      Seq("lang")).collect().head
    assert(viaStream.getAs[Double]("l1") == viaBatch.getAs[Double]("l1"))
    // ref {en:2, de:1} vs cur {en:1, fr:2}: |2*3-1*3|+|1*3-0|+|0-2*3| = 12/9
    assert(math.abs(viaStream.getAs[Double]("l1") - 12.0 / 9) < 1e-15)
  }

  test("streaming near-dup drop suppresses band-bucket collisions") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[GDoc]
    input.addData(
      GDoc(t("2026-01-01 10:00:00"), 1L,
        "the quick brown fox jumps over the lazy dog near the river"),
      GDoc(t("2026-01-01 10:05:00"), 2L,
        "the quick brown fox jumps over the lazy dog near the river"),
      GDoc(t("2026-01-01 10:10:00"), 3L,
        "completely different text about distributed query engines"))
    val q = EventStreams.nearDupDropStream(input.toDF())
      .writeStream.format("memory").queryName("neardup")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val ids = spark.table("neardup").select("doc_id")
      .as[Long].collect().toSet
    assert(ids.size == 2 && ids.contains(3L),
      s"one of the twin docs must be dropped, got $ids")
  }

  test("near-dup drop never deduplicates null-text documents") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[GDoc]
    input.addData(
      GDoc(t("2026-01-01 10:00:00"), 1L, null),
      GDoc(t("2026-01-01 10:05:00"), 2L, null),
      GDoc(t("2026-01-01 10:10:00"), 3L, "some real text here"))
    val q = EventStreams.nearDupDropStream(input.toDF())
      .writeStream.format("memory").queryName("neardup_null")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    // null buckets compare EQUAL in dropDuplicatesWithinWatermark —
    // the uuid fallback must keep both null-text docs alive
    assert(spark.table("neardup_null").count() == 3,
      "null-text docs must not collapse into one another")
  }

  test("streaming ANN probe against the persisted index == batch probe") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, sf())
    val path = "/tmp/graft_idx_spec_stream/binary"
    graft.pipeline.Indexes.writeBinaryIndex(emb, "vec_id",
      "embedding", path)
    val idx = graft.pipeline.Indexes.openBinaryIndex(spark, path)
    val qrows = emb.orderBy("vec_id").limit(6)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
      .as[(Long, Seq[Double])].collect()
    val input = MemoryStream[(Long, Seq[Double])]
    val got = scala.collection.mutable.ArrayBuffer[String]()
    // probe in two micro-batches; the sink accumulates ranked rows
    val writer = EventStreams.annProbeStream(
      input.toDF().toDF("vec_id", "embedding"), idx, emb,
      "vec_id", "vec_id", "embedding", k = 3, shortlist = 15) {
      (ranked, _) => got ++= ranked.collect().map(_.toString)
    }
    input.addData(qrows.take(3).toSeq)
    val q = writer.start()
    q.processAllAvailable()
    input.addData(qrows.drop(3).toSeq)
    q.processAllAvailable(); q.stop()
    // union of per-batch probes == one batch probe over all queries
    // (stateless by construction: queries are independent)
    val want = graft.pipeline.Indexes.binaryTopKIndexed(
        emb.orderBy("vec_id").limit(6), idx, emb, "vec_id", "vec_id",
        "embedding", k = 3, shortlist = 15)
      .collect().map(_.toString)
    assert(got.sorted.toSeq == want.sorted.toSeq)
    assert(got.size == 18)
  }

  test("streaming ANN probe plumbs selfExclude for overlapping id spaces") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, sf())
    val path = "/tmp/graft_idx_spec_stream/binary_overlap"
    graft.pipeline.Indexes.writeBinaryIndex(emb, "vec_id",
      "embedding", path)
    val idx = graft.pipeline.Indexes.openBinaryIndex(spark, path)
    // external queries sharing the corpus's id space — here literally
    // the corpus rows, so each query's truest neighbor HAS its id
    val qrows = emb.orderBy("vec_id").limit(4)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
      .as[(Long, Seq[Double])].collect()
    val input = MemoryStream[(Long, Seq[Double])]
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val writer = EventStreams.annProbeStream(
      input.toDF().toDF("vec_id", "embedding"), idx, emb,
      "vec_id", "vec_id", "embedding", k = 3, shortlist = 15,
      selfExclude = false) { (ranked, _) =>
      got ++= ranked.select("query_id", "neighbor_id")
        .as[(Long, Long)].collect()
    }
    input.addData(qrows.toSeq)
    val q = writer.start()
    q.processAllAvailable(); q.stop()
    // with selfExclude=false the colliding-id neighbor survives: every
    // query finds the corpus row bearing its own id (cos = 1 top hit)
    qrows.foreach { case (id, _) =>
      assert(got.contains((id, id)),
        s"query $id lost its colliding-id true neighbor: $got")
    }
  }

  test("streaming media probe against the persisted index == batch " +
      "probe") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf())
    val media = docs.select(col("doc_id"),
      graft.pipeline.Multimodal.packFakeMedia(col("text")).as("media"))
    val path = "/tmp/graft_idx_spec_stream/media"
    graft.pipeline.Indexes.writeMediaIndex(
      media.filter(col("doc_id") % 2 === 0), "doc_id", "media", path)
    val idx = graft.pipeline.Indexes.openMediaIndex(spark, path)
    val inc = docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
    val input = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer[String]()
    val writer = EventStreams.mediaProbeStream(
      input.toDF().toDF("doc_id", "text")
        .select(col("doc_id"),
          graft.pipeline.Multimodal.packFakeMedia(col("text"))
            .as("media")),
      "doc_id", "media", idx) {
      (pairs, _) => got ++= pairs.collect().map(_.toString)
    }
    val half = inc.length / 2
    input.addData(inc.take(half).toSeq)
    val q = writer.start()
    q.processAllAvailable()
    input.addData(inc.drop(half).toSeq)
    q.processAllAvailable(); q.stop()
    // union of per-batch probes == one batch probe (stateless: the
    // artifact is the state, probes are row-independent)
    val want = graft.pipeline.Indexes.mediaDupPairsIndexed(
        media.filter(col("doc_id") % 2 === 1), "doc_id", "media", idx)
      .collect().map(_.toString)
    assert(got.sorted.toSeq == want.sorted.toSeq)
    assert(got.nonEmpty, "fixture must produce cross-parity pairs")
    graft.core.Caches.releaseAll(spark)
  }

  test("streaming media ingest loop (probe THEN append) == " +
      "sequential batch replay") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf())
    def toMedia(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"),
        graft.pipeline.Multimodal.packFakeMedia(col("text"))
          .as("media"))
    val media = toMedia(docs)
    val inc = docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1)
    val half = inc.length / 2
    val slices = Seq(inc.take(half), inc.drop(half))

    val sPath = "/tmp/graft_idx_spec_stream/media_ingest_s"
    graft.pipeline.Indexes.writeMediaIndex(
      media.filter(col("doc_id") % 2 === 0), "doc_id", "media", sPath)
    val input = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer[String]()
    val writer = EventStreams.mediaIngestStream(
      toMedia(input.toDF().toDF("doc_id", "text")),
      "doc_id", "media", sPath) { (pairs, _) =>
      got ++= pairs.collect().map(_.toString)
    }
    input.addData(slices.head.toSeq)
    val q = writer.start()
    q.processAllAvailable()
    input.addData(slices(1).toSeq)
    q.processAllAvailable(); q.stop()

    // authority: sequential replay on the same slices
    val rPath = "/tmp/graft_idx_spec_stream/media_ingest_r"
    graft.pipeline.Indexes.writeMediaIndex(
      media.filter(col("doc_id") % 2 === 0), "doc_id", "media", rPath)
    val want = scala.collection.mutable.ArrayBuffer[String]()
    slices.zipWithIndex.foreach { case (sl, i) =>
      val bdf = toMedia(sl.toSeq.toDF("doc_id", "text"))
      val idx = graft.pipeline.Indexes.openMediaIndex(spark, rPath)
      want ++= graft.pipeline.Indexes.mediaDupPairsIndexed(bdf,
        "doc_id", "media", idx).collect().map(_.toString)
      graft.pipeline.Indexes.appendMediaIndexBatch(bdf, "doc_id",
        "media", rPath, i)
    }
    assert(got.sorted.toSeq == want.sorted.toSeq)
    assert(got.nonEmpty, "fixture must produce candidates")
    val sIdx = graft.pipeline.Indexes.openMediaIndex(spark, sPath)
    val rIdx = graft.pipeline.Indexes.openMediaIndex(spark, rPath)
    assert(sIdx.collect().map(_.toString).sorted.toSeq ==
      rIdx.collect().map(_.toString).sorted.toSeq,
      "final artifacts must agree")
    // replayed batch id: no-op on the artifact
    val before = rIdx.count()
    assert(!graft.pipeline.Indexes.appendMediaIndexBatch(
      toMedia(slices.head.toSeq.toDF("doc_id", "text")), "doc_id",
      "media", rPath, 0))
    assert(graft.pipeline.Indexes.openMediaIndex(spark, rPath)
      .count() == before)
    graft.core.Caches.releaseAll(spark)
  }

  test("streaming winnow probe against the persisted index == batch " +
      "probe") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf())
    val path = "/tmp/graft_idx_spec_stream/winnow"
    graft.pipeline.Indexes.writeWinnowIndex(
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", path)
    val idx = graft.pipeline.Indexes.openWinnowIndex(spark, path)
    val inc = docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
    val input = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer[String]()
    val writer = EventStreams.winnowProbeStream(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", idx) {
      (pairs, _) => got ++= pairs.collect().map(_.toString)
    }
    val half = inc.length / 2
    input.addData(inc.take(half).toSeq)
    val q = writer.start()
    q.processAllAvailable()
    input.addData(inc.drop(half).toSeq)
    q.processAllAvailable(); q.stop()
    // union of per-batch probes == one batch probe (stateless: the
    // artifact is the state, batch fingerprints are row-local)
    val want = graft.pipeline.Indexes.winnowCandidatesIndexed(
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", idx)
      .collect().map(_.toString)
    assert(got.sorted.toSeq == want.sorted.toSeq)
    assert(got.nonEmpty, "fixture must produce cross-parity candidates")
    graft.core.Caches.releaseAll(spark)
  }

  test("streaming winnow ingest loop (probe THEN append) == " +
      "sequential batch replay") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf())
    val inc = docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1)
    val half = inc.length / 2
    val slices = Seq(inc.take(half), inc.drop(half))

    // stream: probe then append per batch
    val streamPath = "/tmp/graft_idx_spec_stream/winnow_ingest_s"
    graft.pipeline.Indexes.writeWinnowIndex(
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text",
      streamPath)
    val input = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer[String]()
    val writer = EventStreams.winnowIngestStream(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text",
      streamPath) { (pairs, _) =>
      got ++= pairs.collect().map(_.toString)
    }
    input.addData(slices.head.toSeq)
    val q = writer.start()
    q.processAllAvailable()
    input.addData(slices(1).toSeq)
    q.processAllAvailable(); q.stop()

    // authority: sequential replay on the same slices
    val replayPath = "/tmp/graft_idx_spec_stream/winnow_ingest_r"
    graft.pipeline.Indexes.writeWinnowIndex(
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text",
      replayPath)
    val want = scala.collection.mutable.ArrayBuffer[String]()
    slices.foreach { s =>
      val bdf = s.toSeq.toDF("doc_id", "text")
      val idx = graft.pipeline.Indexes.openWinnowIndex(spark, replayPath)
      want ++= graft.pipeline.Indexes.winnowCandidatesIndexed(bdf,
        "doc_id", "text", idx).collect().map(_.toString)
      graft.pipeline.Indexes.appendWinnowIndex(bdf, "doc_id", "text",
        replayPath)
    }
    assert(got.sorted.toSeq == want.sorted.toSeq)
    assert(got.nonEmpty, "fixture must produce candidates")
    // the SECOND batch must have deduped against the FIRST (the
    // append is what the probe-only twin lacks): some candidate's
    // corpus side is an odd doc_id, i.e. a batch-ingested doc
    val idxRows = graft.pipeline.Indexes
      .openWinnowIndex(spark, streamPath)
    val replayRows = graft.pipeline.Indexes
      .openWinnowIndex(spark, replayPath)
    assert(idxRows.collect().map(_.toString).sorted.toSeq ==
      replayRows.collect().map(_.toString).sorted.toSeq,
      "final artifacts must agree")
    graft.core.Caches.releaseAll(spark)
  }

  test("streaming minhash ingest loop (probe THEN append both artifacts) == " +
      "sequential batch replay; replayed batch ids are no-ops") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf())
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val inc = docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1)
    val half = inc.length / 2
    val slices = Seq(inc.take(half), inc.drop(half))

    def seed(base: String): Unit = {
      graft.pipeline.Indexes.writeMinhashIndex(
        corpus, "doc_id", "text", s"$base/index")
      corpus.select(col("doc_id"), col("text"))
        .write.mode("overwrite").parquet(s"$base/docs")
    }

    val sBase = "/tmp/graft_idx_spec_stream/mh_ingest_s"
    seed(sBase)
    val input = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer[String]()
    val writer = EventStreams.minhashIngestStream(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text",
      s"$sBase/index", s"$sBase/docs") { (pairs, _) =>
      got ++= pairs.collect().map(_.toString)
    }
    input.addData(slices.head.toSeq)
    val q = writer.start()
    q.processAllAvailable()
    input.addData(slices(1).toSeq)
    q.processAllAvailable(); q.stop()

    // authority: sequential replay — probe index-so-far, then fold
    // the batch into both artifacts
    val rBase = "/tmp/graft_idx_spec_stream/mh_ingest_r"
    seed(rBase)
    val want = scala.collection.mutable.ArrayBuffer[String]()
    slices.zipWithIndex.foreach { case (s, i) =>
      val bdf = s.toSeq.toDF("doc_id", "text")
      val idx = graft.pipeline.Indexes.openMinhashIndex(spark,
        s"$rBase/index")
      val cor = graft.pipeline.Indexes.openIngestDocs(spark,
        s"$rBase/docs")
      want ++= graft.pipeline.Indexes.incrementalDupPairsIndexed(bdf,
        "doc_id", idx, cor, "doc_id", "text")
        .collect().map(_.toString)
      graft.pipeline.Indexes.appendIngestDocs(
        bdf.select(col("doc_id"), col("text")), s"$rBase/docs", i)
      graft.pipeline.Indexes.appendMinhashIndexBatch(bdf, "doc_id",
        "text", s"$rBase/index", i)
    }
    assert(got.sorted.toSeq == want.sorted.toSeq)
    assert(got.nonEmpty, "fixture must produce candidates")
    // the loop must have deduped batch 2 against batch 1's docs, not
    // just the seed corpus: some candidate pair is odd/odd
    assert(got.exists { r =>
      val ids = "\\d+".r.findAllIn(r).toSeq.take(2).map(_.toLong)
      ids.forall(_ % 2 == 1)
    }, "second batch must match first-batch (odd-id) corpus docs")
    val sIdx = graft.pipeline.Indexes
      .openMinhashIndex(spark, s"$sBase/index")
    val rIdx = graft.pipeline.Indexes
      .openMinhashIndex(spark, s"$rBase/index")
    assert(sIdx.collect().map(_.toString).sorted.toSeq ==
      rIdx.collect().map(_.toString).sorted.toSeq,
      "final index artifacts must agree")
    // at-least-once REPLAY safety (round-16 ADVICE): re-applying an
    // already-folded batch id is a no-op on both artifacts
    val beforeIdx = rIdx.count()
    val beforeDocs = graft.pipeline.Indexes
      .openIngestDocs(spark, s"$rBase/docs").count()
    assert(!graft.pipeline.Indexes.appendMinhashIndexBatch(
      slices.head.toSeq.toDF("doc_id", "text"), "doc_id", "text",
      s"$rBase/index", 0))
    assert(!graft.pipeline.Indexes.appendIngestDocs(
      slices.head.toSeq.toDF("doc_id", "text"), s"$rBase/docs", 0))
    assert(graft.pipeline.Indexes
      .openMinhashIndex(spark, s"$rBase/index").count() == beforeIdx)
    assert(graft.pipeline.Indexes
      .openIngestDocs(spark, s"$rBase/docs").count() == beforeDocs)
    assert(graft.pipeline.Indexes.batchApplied(spark,
      s"$rBase/index", 0))
    assert(!graft.pipeline.Indexes.batchApplied(spark,
      s"$rBase/index", 99))
    graft.core.Caches.releaseAll(spark)
  }

  test("streaming minhash dup-pairs probe against the persisted " +
      "index == batch probe") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf())
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val path = "/tmp/graft_idx_spec_stream/minhash"
    graft.pipeline.Indexes.writeMinhashIndex(
      corpus, "doc_id", "text", path)
    val idx = graft.pipeline.Indexes.openMinhashIndex(spark, path)
    val inc = docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
    val input = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer[String]()
    val writer = EventStreams.dupPairsProbeStream(
      input.toDF().toDF("doc_id", "text"), "doc_id", idx,
      corpus, "doc_id", "text") {
      (pairs, _) => got ++= pairs.collect().map(_.toString)
    }
    val half = inc.length / 2
    input.addData(inc.take(half).toSeq)
    val q = writer.start()
    q.processAllAvailable()
    input.addData(inc.drop(half).toSeq)
    q.processAllAvailable(); q.stop()
    val want = graft.pipeline.Indexes.incrementalDupPairsIndexed(
        docs.filter(col("doc_id") % 2 === 1), "doc_id", idx,
        corpus, "doc_id", "text")
      .collect().map(_.toString)
    assert(got.sorted.toSeq == want.sorted.toSeq)
    assert(got.nonEmpty, "fixture must produce cross-parity pairs")
    graft.core.Caches.releaseAll(spark)
  }

  test("streaming dedup drops duplicates within watermark") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[GEvent]
    input.addData(
      GEvent(t("2026-01-01 10:00:00"), "a", 1.0),
      GEvent(t("2026-01-01 10:10:00"), "a", 1.0), // dup key within horizon
      GEvent(t("2026-01-01 10:20:00"), "b", 2.0))
    val q = EventStreams.dedupStream(input.toDF(), Seq("event_type"))
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("dedup").count() == 2)
  }
}
