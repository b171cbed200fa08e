package graft.functions

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.pipeline.Dedup

/** The fused native minhash expressions must be bit-identical to the
  * Column-HOF pipeline they replaced (shingles → shingleHash →
  * signatureOfHashes → bandsMd5) — the DuckDB oracle mirrors THAT
  * pipeline literally, so equality here keeps the gate meaningful.
  */
class MinhashNativeSpec extends SparkSpec {

  private def texts = {
    import spark.implicits._
    Tables.documents(spark, sf("sf0.01")).select(col("text"))
      .union(Seq(
        "", "   ", "one two", "one two three",
        "one two three four five one two three",
        "Punct!!!separated TOKENS-and_digits 007",
        "ünïcode tokens règle straße 日本 mixed"
      ).toDF("text"))
  }

  test("native Shingles == Column shingles") {
    val diff = texts.select(
        Shingles(col("text"), 3).as("n"),
        Dedup.shingles(col("text"), 3).as("c"))
      .filter(not(col("n") <=> col("c"))).count()
    assert(diff == 0)
  }

  test("native MinhashBandBuckets == Column bandsMd5 pipeline") {
    val colForm = Dedup.bandsMd5(
      Dedup.signatureOfHashes(
        transform(Dedup.shingles(col("text"), 3), Dedup.shingleHash _),
        32), 8, 4)
    val diff = texts.select(
        MinhashBandBuckets(col("text"), 3, 32, 8).as("n"),
        colForm.as("c"))
      .filter(not(col("n").cast("string") <=> col("c").cast("string")))
      .count()
    assert(diff == 0)
  }

  test("native MinhashSigElement == Column minhashElementMd5") {
    Seq(0, 7, 31).foreach { i =>
      val diff = texts.select(
          MinhashSigElement(col("text"), 3, i, 32).as("n"),
          Dedup.minhashElementMd5(
            Dedup.shingles(col("text"), 3), i, 32).as("c"))
        .filter(not(col("n") <=> col("c"))).count()
      assert(diff == 0, s"element $i")
    }
  }

  test("native MinhashSignature == Column signatureOfHashes pipeline") {
    val colForm = Dedup.signatureOfHashes(
      transform(Dedup.shingles(col("text"), 3), Dedup.shingleHash _),
      32)
    val diff = texts.select(
        MinhashSignature(col("text"), 3, 32).as("n"),
        colForm.as("c"))
      .filter(not(col("n").cast("string") <=> col("c").cast("string")))
      .count()
    assert(diff == 0)
    // the empty-string edge rides the same equality (whatever the
    // shingle rule emits for "", the kernel must match the column
    // form element-for-element — array_min over empty being NULL)
    import spark.implicits._
    val e = Seq("").toDF("text")
      .select(MinhashSignature(col("text"), 3, 32).cast("string")
          .as("n"),
        colForm.cast("string").as("c"))
      .head
    assert(e.getString(0) == e.getString(1), e.toString)
  }

  test("native ShingleHashes == distinct Column shingleHash transform") {
    val diff = texts.select(
        ShingleHashes(col("text"), 3).as("n"),
        array_distinct(transform(Dedup.shingles(col("text"), 3),
          Dedup.shingleHash _)).as("c"))
      .filter(not(col("n") <=> col("c"))).count()
    assert(diff == 0)
  }

  test("null text stays null") {
    import spark.implicits._
    val df = Seq(Option.empty[String], Some("x y z a b c")).toDF("text")
    val rows = df.select(
      Shingles(col("text"), 3).isNull.as("a"),
      MinhashBandBuckets(col("text"), 3, 32, 8).isNull.as("b"),
      MinhashSigElement(col("text"), 3, 0, 32).isNull.as("c")).collect()
    assert(rows.head.getBoolean(0) && rows.head.getBoolean(1) &&
      rows.head.getBoolean(2))
  }
}
