package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** TextFns.sentences / sentenceChunks semantics. */
class SentenceSpec extends SparkSpec {

  private def sents(text: String): Seq[String] = {
    import spark.implicits._
    Seq(text).toDF("t").select(TextFns.sentences(col("t")))
      .head.getSeq[String](0)
  }

  test("terminators attach to their sentence; runs and tails split") {
    assert(sents("one two. three four! five?? tail no dot") ==
      Seq("one two.", "three four!", "five??", "tail no dot"))
  }

  test("stray terminator runs and whitespace are not sentences") {
    assert(sents("a. !! ?. b") == Seq("a.", "b"))
    assert(sents("...") == Seq.empty)
    assert(sents("") == Seq.empty)
  }

  test("sentenceChunks packs greedily and never splits a sentence") {
    import spark.implicits._
    // token counts: 3, 2, 4, 1 with budget 5 → chunks [0,0,1,1]
    val ss = Seq(Seq("a b c.", "d e!", "f g h i?", "j"))
    val got = ss.toDF("ss")
      .select(TextFns.sentenceChunks(col("ss"), budget = 5))
      .head.getSeq[Int](0)
    assert(got == Seq(0, 0, 1, 1))
    // an over-budget sentence still lands alone in its own chunk
    val big = Seq(Seq("a b.", "one two three four five six seven",
      "c d."))
    val got2 = big.toDF("ss")
      .select(TextFns.sentenceChunks(col("ss"), budget = 4))
      .head.getSeq[Int](0)
    assert(got2 == Seq(0, 1, 2))
  }

  test("token counting uses the RE2 whitespace set, not Unicode") {
    import spark.implicits._
    // U+2028 LINE SEPARATOR is Character.isWhitespace but not RE2 \s:
    // "a b" is ONE token, so both sentences fit budget 2
    val got = Seq(Seq("a b", "x")).toDF("ss")
      .select(TextFns.sentenceChunks(col("ss"), budget = 2))
      .head.getSeq[Int](0)
    assert(got == Seq(0, 0))
  }

  test("tokenCount and normalize treat \\x0B as text, like RE2") {
    import spark.implicits._
    // Java's \s matches vertical tab, RE2's does not; the pipeline
    // contract (TextFns.WsRe) follows RE2 so the DuckDB oracles agree
    val r = Seq(("ab c", "ab  c")).toDF("t", "u")
      .select(TextFns.tokenCount(col("t")).as("n"),
        Dedup.normalize(col("u")).as("norm"))
      .head
    assert(r.getLong(0) == 2L)          // "a\x0Bb" is ONE token
    assert(r.getString(1) == "ab c")
  }

  test("chunk ids are dense and non-decreasing (random texts)") {
    val rnd = new scala.util.Random(11)
    import spark.implicits._
    val rows = (0 until 30).map { i =>
      val n = rnd.nextInt(8)
      (i, (0 until n).map(j =>
        Seq.fill(1 + rnd.nextInt(6))("w").mkString(" ") + "."))
    }
    val got = rows.toDF("i", "ss")
      .select(col("i"), TextFns.sentenceChunks(col("ss"), 6).as("c"))
      .collect()
    got.foreach { r =>
      val c = r.getSeq[Int](1)
      assert(c.zip(c.drop(1)).forall { case (a, b) =>
        b == a || b == a + 1 }, s"row ${r.getInt(0)}")
      assert(c.isEmpty || c.head == 0)
    }
  }
}
