package graft.functions

import graft.SparkSpec
import graft.pipeline.TextFns
import org.apache.spark.sql.functions._

/** Pins ChunkHashes/ChunkSizes ≡ the Column-composed chunks() pipeline
  * (same windows, same n_tokens, chunk_hash = md5 of the exact chunk
  * string) — the native forms exist so gates never materialize chunk
  * text, and this equivalence is what makes that a pure optimization.
  */
class ChunkExprsSpec extends SparkSpec {
  import spark.implicits._

  private def edgeDocs = Seq(
    (1L, ""), (2L, "   \t\n  "), (3L, "one"),
    (4L, "a b c d e f g h i j"), (5L, " lead  and\ttab\nnl trail "),
    (6L, "Ünïcode tökens appear in UTF-8 byte fòrm £ ∑ ok"),
    (7L, ("tok " * 200).trim)).toDF("doc_id", "text")

  private def viaColumns(df: org.apache.spark.sql.DataFrame,
      size: Int, overlap: Int) =
    df.select(col("doc_id"),
        explode(TextFns.chunks(col("text"), size, overlap)).as("c"))
      .select(col("doc_id"), col("c.idx").as("idx"),
        col("c.n_tokens").as("n_tokens"), md5(col("c.chunk")).as("h"))

  private def viaNative(df: org.apache.spark.sql.DataFrame,
      size: Int, overlap: Int) =
    df.select(col("doc_id"),
        explode(ChunkHashes(col("text"), size, overlap)).as("c"))
      .select(col("doc_id"), col("c.idx").as("idx"),
        col("c.n_tokens").as("n_tokens"), col("c.chunk_hash").as("h"))

  private def assertSame(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): Unit = {
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"native/Column chunk mismatch:\nA-B=${a.exceptAll(b).collect()
        .mkString(",")}\nB-A=${b.exceptAll(a).collect().mkString(",")}")
  }

  test("ChunkHashes matches md5(chunks()) on edge-case documents") {
    assertSame(viaColumns(edgeDocs, 4, 1), viaNative(edgeDocs, 4, 1))
    assertSame(viaColumns(edgeDocs, 8, 3), viaNative(edgeDocs, 8, 3))
    assertSame(viaColumns(edgeDocs, 1, 0), viaNative(edgeDocs, 1, 0))
  }

  test("ChunkHashes matches md5(chunks()) on the documents table") {
    val doc = graft.Tables.documents(spark, sf())
    assertSame(viaColumns(doc, 64, 16), viaNative(doc, 64, 16))
  }

  test("ChunkSizes matches chunks() windows") {
    val a = edgeDocs.select(col("doc_id"),
        explode(TextFns.chunks(col("text"), 5, 2)).as("c"))
      .select(col("doc_id"), col("c.idx"), col("c.n_tokens"))
    val b = edgeDocs.select(col("doc_id"),
        explode(ChunkSizes(col("text"), 5, 2)).as("c"))
      .select(col("doc_id"), col("c.idx"), col("c.n_tokens"))
    assertSame(a.withColumnRenamed("n_tokens", "h"),
      b.withColumnRenamed("n_tokens", "h"))
  }

  test("null text yields null (explode drops the row) in both forms") {
    val df = Seq((1L, Option.empty[String]), (2L, Some("a b")))
      .toDF("doc_id", "text")
    assert(viaNative(df, 4, 1).count() == viaColumns(df, 4, 1).count())
  }
}
