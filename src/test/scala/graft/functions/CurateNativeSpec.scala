package graft.functions

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.pipeline.{Dedup, TextFns}

/** The fused curation kernel must be bit-identical to the Column
  * compositions it replaced in pCurate — quality ==
  * TextFns.qualityScore, key == md5(Dedup.normalize) — over the whole
  * real documents table plus adversarial edge shapes (whitespace runs,
  * unicode case mappings, punctuation floods, stopword-only text).
  */
class CurateNativeSpec extends SparkSpec {

  private def edgeDf = {
    import spark.implicits._
    Seq(
      "",
      "   ",
      "\t\n  mixed\tWS   runs \r\n",
      "short",
      "the a an and or of to in is are was it that this for with on",
      "punct!!!and---separators___ok 123abc .,;:!?'\"()[]{}-",
      "unicode: Ünïcødé ÉLAN straße ÇA ΣΊΣΥΦΟΣ, 日本語 emoji 🙂 done",
      "a",
      "averageishwordlenghtstress twelve-char-ish words exactly here",
      ".,;:!?'\"()[]{}-.,;:!?'\"()[]{}-",
      "repeat repeat repeat repeat repeat repeat repeat repeat"
    ).toDF("text")
  }

  test("fused CurateSignals == Column forms on documents + edges") {
    val doc = Tables.documents(spark, sf("sf0.01")).select(col("text"))
      .union(edgeDf)
    val sig = CurateSignals(col("text"))
    val diff = doc.select(
        sig.getField("quality").as("nq"),
        sig.getField("key").as("nk"),
        TextFns.qualityScore(col("text")).as("cq"),
        md5(Dedup.normalize(col("text"))).as("ck"))
      .filter(not(col("nq") <=> col("cq")) ||
        not(col("nk") <=> col("ck")))
    val bad = diff.count()
    if (bad != 0) diff.show(5, false)
    assert(bad == 0)
  }
}
