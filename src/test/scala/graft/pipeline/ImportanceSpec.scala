package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ImportanceSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the cat sat on the mat and the dog ran", "en"),
    (2L, "the dog sat on the log and the cat ran", "en"),
    (3L, "der hund sitzt auf dem baum und der hund läuft", "de"),
    (4L, "der baum steht auf dem berg und der berg ruht", "de"),
    (5L, "the cat and the dog sat together on the mat", "en"))
    .toDF("doc_id", "text", "lang")

  test("target-like documents score above off-target documents") {
    val out = Importance.importanceWeights(
        corpus, corpus.filter(col("lang") === "en"), "doc_id", "text",
        dim = 64, gram = 2)
      .select("doc_id", "log_weight").as[(Long, Double)]
      .collect().toMap
    // every English doc outranks every German doc under an English
    // target: its bigrams are relatively MORE frequent in the target
    val en = Seq(1L, 2L, 5L).map(out)
    val de = Seq(3L, 4L).map(out)
    assert(en.min > de.max,
      s"en ${en.mkString(",")} must all exceed de ${de.mkString(",")}")
  }

  test("scores are exact and partition-stable") {
    val a = Importance.importanceWeights(corpus,
        corpus.filter(col("lang") === "en"), "doc_id", "text",
        dim = 64, gram = 2)
      .orderBy("doc_id").select("score_fix").as[Long].collect().toSeq
    val b = Importance.importanceWeights(corpus.repartition(7),
        corpus.filter(col("lang") === "en"), "doc_id", "text",
        dim = 64, gram = 2)
      .orderBy("doc_id").select("score_fix").as[Long].collect().toSeq
    assert(a == b)
  }

  test("gramSeq counts occurrences, short docs contribute whole text") {
    val g = Seq(("a b a b c", "x"))
      .toDF("text", "pad")
      .select(Importance.gramSeq(col("text"), 2).as("g"))
      .as[Seq[String]].head()
    assert(g == Seq("a b", "b a", "a b", "b c"),
      "repeated bigram must appear per occurrence")
    val short = Seq(("hi", "x")).toDF("text", "pad")
      .select(Importance.gramSeq(col("text"), 3).as("g"))
      .as[Seq[String]].head()
    assert(short == Seq("hi"))
  }

  test("native kernels match the Column gram/bucket semantics") {
    // DsirScore/GramBuckets vs the reference Column forms (gramSeq +
    // bucketOf + aggregate) on mixed-script text, short docs, and the
    // empty string
    val docs = corpus.union(Seq(
      (6L, "", "x"), (7L, "hi", "x"),
      (8L, "Üppige BÄUME; 42 Straßen—éclairs ΣΙΣΥΦΟΣ, δύο!", "x"))
      .toDF("doc_id", "text", "lang"))
    val dim = 64
    val ratios = Array.tabulate(dim)(b => (b * 2654435761L) % 1000 - 500)
    val colForm = docs.select(col("doc_id"),
        aggregate(Importance.gramSeq(col("text"), 2), lit(0L),
          (acc, g) => acc + element_at(lit(ratios),
            (Importance.bucketOf(g, dim) + 1).cast("int"))).as("s"))
      .as[(Long, Long)].collect().toMap
    val native = docs.select(col("doc_id"),
        graft.functions.DsirScore(col("text"), 2, dim, ratios).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(native == colForm)
    val colBuckets = docs.select(col("doc_id"),
        transform(Importance.gramSeq(col("text"), 2),
          g => Importance.bucketOf(g, dim)).as("b"))
      .as[(Long, Seq[Long])].collect().toMap
    val nativeBuckets = docs.select(col("doc_id"),
        graft.functions.GramBuckets(col("text"), 2, dim).as("b"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(nativeBuckets == colBuckets)
  }

  test("sliced one-scan weights equal the two-scan general form") {
    val a = Importance.importanceWeightsSliced(corpus,
        col("lang") === "en", "doc_id", "text", dim = 64, gram = 2)
      .orderBy("doc_id")
      .select("doc_id", "score_fix", "log_weight")
      .as[(Long, Long, Double)].collect().toSeq
    val b = Importance.importanceWeights(corpus,
        corpus.filter(col("lang") === "en"), "doc_id", "text",
        dim = 64, gram = 2)
      .orderBy("doc_id")
      .select("doc_id", "score_fix", "log_weight")
      .as[(Long, Long, Double)].collect().toSeq
    assert(a == b)
  }

  test("unigram cross-entropy: reference-like docs score lower") {
    val out = Importance.unigramCrossEntropy(corpus,
        corpus.filter(col("lang") === "en"), "doc_id", "text",
        vocabSize = 64)
      .select("doc_id", "cross_entropy").as[(Long, Double)]
      .collect().toMap
    val en = Seq(1L, 2L, 5L).map(out)
    val de = Seq(3L, 4L).map(out)
    assert(en.max < de.min,
      s"en docs must have lower cross-entropy: $en vs $de")
    assert(out.values.forall(_ > 0), "cross-entropy is positive")
  }

  test("unigram cross-entropy: exact fixed point, empty docs null") {
    val withEmpty = corpus.union(Seq((9L, "", "en"))
      .toDF("doc_id", "text", "lang"))
    val out = Importance.unigramCrossEntropy(withEmpty,
        withEmpty.filter(col("lang") === "en"), "doc_id", "text",
        vocabSize = 8)
      .orderBy("doc_id")
      .select("doc_id", "ce_fix", "n_tokens").as[(Long, Long, Long)]
      .collect()
    assert(out.last == ((9L, 0L, 0L)))
    val ce = Importance.unigramCrossEntropy(withEmpty,
        withEmpty.filter(col("lang") === "en"), "doc_id", "text",
        vocabSize = 8)
      .filter(col("doc_id") === 9L)
      .select("cross_entropy").collect()(0)
    assert(ce.isNullAt(0), "empty doc has no defined cross-entropy")
    // repartition-stable (exact long sums)
    val a = Importance.unigramCrossEntropy(withEmpty,
      withEmpty.filter(col("lang") === "en"), "doc_id", "text", 8)
      .orderBy("doc_id").select("ce_fix").as[Long].collect().toSeq
    val b = Importance.unigramCrossEntropy(withEmpty.repartition(5),
      withEmpty.filter(col("lang") === "en"), "doc_id", "text", 8)
      .orderBy("doc_id").select("ce_fix").as[Long].collect().toSeq
    assert(a == b)
  }

  test("ccnetBuckets: per-language models, deterministic tertiles") {
    // three languages: >2 CASE branches (the when-chain regression)
    val docs = corpus.union(Seq(
        (6L, "completely unrelated xylophone quartz vortex", "en"),
        (7L, "", "de"),
        (8L, "le chat et le chien dorment sur le tapis", "fr"))
      .toDF("doc_id", "text", "lang"))
    val out = Importance.ccnetBuckets(docs, "doc_id", "text", "lang",
        vocabSize = 16)
      .select("doc_id", "lang", "bucket").as[(Long, String, String)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // 4 en docs -> tertiles 2/1/1; 3 de docs -> 1/1/1
    assert(out.values.count(_._1 == "en") == 4)
    assert(out(6L)._2 == "tail",
      s"the all-OOV en doc must land in the tail: $out")
    assert(out(7L)._2 == "tail",
      "the empty de doc (null entropy, NULLS LAST) lands in the tail")
    // scoring under a single-language corpus == the plain unigram CE
    val en = docs.filter(col("lang") === "en")
    val plain = Importance.unigramCrossEntropy(en, en, "doc_id",
        "text", vocabSize = 16)
      .select("doc_id", "ce_fix").as[(Long, Long)].collect().toMap
    val multi = Importance.ccnetBuckets(docs, "doc_id", "text",
        "lang", vocabSize = 16)
      .filter(col("lang") === "en")
      .select("doc_id", "ce_fix").as[(Long, Long)].collect().toMap
    assert(multi == plain,
      "per-language CASE scoring must equal the single-model form")
    // partition-stable
    val a = Importance.ccnetBuckets(docs, "doc_id", "text", "lang", 16)
      .orderBy("doc_id").select("bucket").as[String].collect().toSeq
    val b = Importance.ccnetBuckets(docs.repartition(5), "doc_id",
        "text", "lang", 16)
      .orderBy("doc_id").select("bucket").as[String].collect().toSeq
    assert(a == b)
  }

  test("trainLinearQuality separates the labeled classes") {
    val (w, b) = TextFns.trainLinearQuality(corpus, "text",
      col("lang") === "en", dim = 32, iters = 4, lr = 0.5)
    assert(w.length == 32 && w.exists(_ != 0.0))
    assert(w.forall(x => math.abs(x) <= 4 * 0.5),
      "per-step weight change is bounded by lr")
    val margins = corpus.select(col("doc_id"),
        TextFns.linearQualityCol(col("text"), 32, 0,
          Some(w.toIndexedSeq), b).getField("margin"))
      .as[(Long, Double)].collect().toMap
    val en = Seq(1L, 2L, 5L).map(margins)
    val de = Seq(3L, 4L).map(margins)
    assert(en.min > de.max,
      s"trained margins must separate: en $en vs de $de")
  }

  test("trainLinearQuality is partition-stable (exact gradients)") {
    val (w1, b1) = TextFns.trainLinearQuality(corpus, "text",
      col("lang") === "en", dim = 16, iters = 2, lr = 0.5)
    val (w2, b2) = TextFns.trainLinearQuality(corpus.repartition(7),
      "text", col("lang") === "en", dim = 16, iters = 2, lr = 0.5)
    assert(w1.toSeq == w2.toSeq && b1 == b2)
  }

  test("trainLangId + langIdModel: classifies held-in docs, stable") {
    val langs = Seq("de", "en")
    val m = Importance.trainLangId(corpus, "lang", "text", langs,
      dim = 64, gram = 3)
    assert(m.length == 2 * 64)
    val pred = Importance.langIdModel(corpus, m, langs, "doc_id",
        "text", dim = 64, gram = 3)
      .select("doc_id", "pred_lang").as[(Long, String)]
      .collect().toMap
    assert(pred == Map(1L -> "en", 2L -> "en", 5L -> "en",
      3L -> "de", 4L -> "de"))
    def scores(df: org.apache.spark.sql.DataFrame) =
      Importance.langIdModel(df, m, langs, "doc_id", "text",
          dim = 64, gram = 3)
        .orderBy("doc_id").select("score_fix").as[Long]
        .collect().toSeq
    assert(scores(corpus) == scores(corpus.repartition(7)),
      "exact long scores are partition-stable")
    // explicit label set: unknown-label rows contribute nothing but
    // still classify
    val withX = corpus.union(Seq((9L, "ein und zwei und drei", "xx"))
      .toDF("doc_id", "text", "lang"))
    val m2 = Importance.trainLangId(withX, "lang", "text", langs,
      dim = 64, gram = 3)
    assert(m2.toSeq == m.toSeq, "unlabeled rows don't shift the model")
    val p9 = Importance.langIdModel(withX, m2, langs, "doc_id",
        "text", dim = 64, gram = 3)
      .filter(col("doc_id") === 9L).select("pred_lang")
      .as[String].head()
    assert(p9 == "de")
  }

  test("fixedRatios: smoothing covers unseen buckets, ratios bounded") {
    val ht = Array(10L, 0L, 3L, 0L)
    val hr = Array(5L, 5L, 0L, 0L)
    val f = Importance.fixedRatios(ht, hr)
    assert(f.length == 4)
    // bucket 0: more mass in target -> positive; bucket 1: only raw
    // mass -> negative; bucket 3: unseen in both -> ln(tr/tt) constant
    assert(f(0) > 0 && f(1) < 0)
    val expect3 = math.floor((math.log(1.0 / (13 + 4)) -
      math.log(1.0 / (10 + 4))) * Importance.FixScale).toLong
    assert(f(3) == expect3)
  }
}
