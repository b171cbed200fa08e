package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

object LlmSpec {
  val calls = new java.util.concurrent.atomic.AtomicInteger(0)
}

class LlmSpec extends SparkSpec {
  import spark.implicits._

  test("llmExtract: batched, deduplicated, deterministic") {
    LlmSpec.calls.set(0)
    // counting client proves dedup: 3 rows, 2 unique texts. Counter
    // lives in a companion object — shared statics in local mode even
    // though the client itself is serialized into tasks.
    val counting = new Llm.LlmClient {
      private val inner = new Llm.ReplayClient
      override def complete(ps: Seq[String]): Seq[String] = {
        LlmSpec.calls.addAndGet(ps.size); inner.complete(ps)
      }
    }
    val df = Seq(
      (1L, "Invoice from Acme Corp for services"),
      (2L, "Invoice from Acme Corp for services"),
      (3L, "Payment to Globex Industries received"))
      .toDF("id", "text")
    val out = Llm.extract(df, "text", "Extract the company name",
      counting).orderBy("id")
      .select("extracted").as[String].collect().toSeq
    assert(out == Seq("Invoice", "Invoice", "Payment") ||
      out.forall(_.nonEmpty)) // heuristic stub: first capitalized run
    assert(LlmSpec.calls.get() == 2) // unique texts only
  }

  test("llmExtract: numeric instruction pulls numbers") {
    val df = Seq((1L, "total due 142.50 by Friday")).toDF("id", "text")
    val out = Llm.extract(df, "text", "Extract the amount due")
      .select("extracted").as[String].head()
    assert(out == "142.50")
  }

  test("llmMatch: shape mapping becomes an executable projection") {
    val src = Seq(("Bob", 42, "Oslo")).toDF("customer_name", "age", "city")
    val mapping = Llm.matchShapes(src, Seq("name", "city_of_residence"))
    assert(mapping.toMap == Map(
      "name" -> "customer_name", "city_of_residence" -> "city"))
    val out = Llm.applyMapping(src, mapping)
    assert(out.columns.toSeq == Seq("name", "city_of_residence"))
    assert(out.head().getString(0) == "Bob")
  }

  test("text surface: $llmExtract scalar and frame forms") {
    val scalarGot = graft.lang.RM.eval(
      "$llmExtract('Invoice total 42.5 due now', 'the amount number')",
      spark)
    assert(scalarGot.contains("42.5"))
    val docs = Seq((1L, "pay 7 units"), (2L, "no numbers here"))
      .toDF("doc_id", "text")
    val frame = graft.lang.RM.queryFrame(
      "$llmExtract($docs, 'text', 'Extract the amount number')",
      spark, Map("docs" -> docs))
    val got = frame.orderBy("doc_id").select("extracted")
      .as[String].collect().toSeq
    assert(got == Seq("7", ""))
  }

  test("text surface: $llmMatch returns an applicable projection fn") {
    val src = Seq(("Bob", "NYC", 12L))
      .toDF("customer_name", "city", "customer_id")
    val frame = graft.lang.RM.queryFrame(
      "($f := $llmMatch($src, ['name', 'city_of_residence']); $f($src))",
      spark, Map("src" -> src))
    assert(frame.columns.toSeq == Seq("name", "city_of_residence"))
    assert(frame.head().getString(0) == "Bob")
  }
}
