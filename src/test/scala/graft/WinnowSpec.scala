package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val lorem = ("alpha beta gamma delta epsilon zeta eta theta " +
    "iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon")

  test("substring guarantee: docs sharing >= w+k-1 tokens share a fingerprint") {
    // k=4, w=8 -> any shared run of 11 tokens must collide
    val shared = "one two three four five six seven eight nine ten eleven"
    val df = Seq(
      (1L, s"$lorem $shared"),
      (2L, s"$shared completely different tail words here now")
    ).toDF("doc_id", "text")
    val fps = df.select(col("doc_id"),
        explode(Dedup.winnow(col("text"), 4, 8)).as("f"))
      .select(col("doc_id"), col("f.h")).distinct()
    val common = fps.groupBy("h").agg(countDistinct("doc_id").as("nd"))
      .filter(col("nd") === 2).count()
    assert(common > 0)
  }

  test("winnowPairs finds the near-dup pair and respects minShared") {
    val df = Seq(
      (1L, lorem),
      (2L, lorem + " with a small suffix change"),
      (3L, "entirely unrelated content about ships and harbors and " +
        "gulls and tides and ropes and salt and wind and sails")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(df, "doc_id", "text", k = 4, w = 8,
      minShared = 2).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
    assert(!pairs.exists(r => r.getLong(1) == 3L || r.getLong(0) == 3L))
  }

  test("winnowPairsAgainst == winnowPairs restricted to probe-touching pairs") {
    // the incremental-check form must agree with the self-join
    // authority on every pair that touches the probe side: for probe
    // P ⊂ corpus, winnowPairsAgainst(P, corpus) symmetrized equals
    // winnowPairs(corpus) pairs with an endpoint in P (both caps are
    // computed over the same corpus bucket counts)
    val doc = Tables.documents(spark, sf()).limit(400)
    val probe = doc.filter(col("doc_id") < 60)
    val against = Dedup.winnowPairsAgainst(probe, "doc_id",
        doc, "doc_id", "text", k = 4, w = 8, minShared = 2)
      .select(least(col("new_id"), col("corpus_id")).as("a"),
        greatest(col("new_id"), col("corpus_id")).as("b"),
        col("n_shared"))
      .distinct().collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val self = Dedup.winnowPairs(doc, "doc_id", "text", k = 4, w = 8,
        minShared = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(p => p._1 < 60 || p._2 < 60).toSet
    assert(against == self,
      s"only-against=${(against -- self).take(5)} " +
        s"only-self=${(self -- against).take(5)}")
  }

  test("simhashPairsMd5Against == self-join pairs restricted to probe") {
    val doc = Tables.documents(spark, sf()).limit(400)
    val probe = doc.filter(col("doc_id") < 60)
    val against = Dedup.simhashPairsMd5Against(probe, "doc_id",
        doc, "doc_id", "text", maxDistance = 3)
      .select(least(col("new_id"), col("corpus_id")).as("a"),
        greatest(col("new_id"), col("corpus_id")).as("b"),
        col("dist"))
      .distinct().collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val self = Dedup.simhashPairsMd5(doc, "doc_id", "text",
        maxDistance = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .filter(p => p._1 < 60 || p._2 < 60).toSet
    assert(against == self,
      s"only-against=${(against -- self).take(5)} " +
        s"only-self=${(self -- against).take(5)}")
  }

  test("density: winnowed fingerprints are a small fraction of all grams") {
    val doc = Tables.documents(spark, sf())
    val counts = doc.select(
        size(graft.functions.GramHashSeq(col("text"), 4)).as("grams"),
        size(Dedup.winnow(col("text"), 4, 8)).as("fps"))
      .filter(col("grams") > 50)
      .agg(sum("grams").as("g"), sum("fps").as("f")).head()
    val (g, f) = (counts.getLong(0), counts.getLong(1))
    // expected density 2/(w+1) = 2/9; allow slack either way
    assert(f.toDouble / g < 0.35 && f.toDouble / g > 0.10)
  }

  test("short docs still fingerprint: fewer grams than the window -> one selection") {
    val df = Seq((1L, "just five little tokens here")).toDF("doc_id", "text")
    // 5 tokens, k=4 -> 2 grams < w=8 -> exactly one fingerprint
    assert(df.select(size(Dedup.winnow(col("text"), 4, 8))).head().getInt(0) == 1)
    val empty = Seq((1L, "too short")).toDF("doc_id", "text")
    assert(empty.select(size(Dedup.winnow(col("text"), 4, 8))).head().getInt(0) == 0)
  }
}
