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

  // ---- production-client seam: retry / backoff / rate limit ----

  /** Fails the first `failures` calls, then answers; records sleeps
    * through the injected sleeper rather than wall-clock waiting.
    */
  private class FlakyClient(failures: Int) extends Llm.LlmClient {
    var calls = 0
    override def complete(ps: Seq[String]): Seq[String] = {
      calls += 1
      if (calls <= failures)
        throw new java.io.IOException(s"transient #$calls")
      ps.map("ok:" + _)
    }
  }

  test("resilient client retries transient failures with exponential backoff") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    var now = 0L
    val flaky = new FlakyClient(2)
    val cli = new ResilientClient(flaky,
      Resilience.Policy(maxAttempts = 4, baseBackoffMs = 100,
        maxCallsPerSecond = 1e9), // rate limit out of the way
      sleeper = ms => { sleeps += ms; now += ms * 1000000 },
      clockNs = () => now)
    assert(cli.complete(Seq("a", "b")) == Seq("ok:a", "ok:b"))
    assert(flaky.calls == 3)
    // the advancing fake clock keeps the (1e9/s) rate limiter silent,
    // so the recorded sleeps are exactly the retry backoffs
    assert(sleeps.toSeq == Seq(100L, 200L),
      s"backoff must double per retry, got $sleeps")
  }

  test("resilient client rethrows after maxAttempts") {
    val flaky = new FlakyClient(10)
    val cli = new ResilientClient(flaky,
      Resilience.Policy(maxAttempts = 3, baseBackoffMs = 1,
        maxCallsPerSecond = 1e9),
      sleeper = _ => (), clockNs = () => 0L)
    val e = intercept[java.io.IOException] { cli.complete(Seq("x")) }
    assert(e.getMessage == "transient #3" && flaky.calls == 3)
  }

  test("answer-arity mismatch is a protocol error and retries") {
    var calls = 0
    val short = new Llm.LlmClient {
      override def complete(ps: Seq[String]): Seq[String] = {
        calls += 1
        if (calls == 1) ps.drop(1).map("ok:" + _) // short answer once
        else ps.map("ok:" + _)
      }
    }
    val cli = new ResilientClient(short,
      Resilience.Policy(maxAttempts = 2, baseBackoffMs = 1,
        maxCallsPerSecond = 1e9),
      sleeper = _ => (), clockNs = () => 0L)
    assert(cli.complete(Seq("a", "b")) == Seq("ok:a", "ok:b"))
    assert(calls == 2)
  }

  test("rate limiter spaces calls at the configured interval") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    var now = 0L
    val fast = new Llm.LlmClient {
      override def complete(ps: Seq[String]): Seq[String] = ps
    }
    val cli = new ResilientClient(fast,
      Resilience.Policy(maxAttempts = 1, maxCallsPerSecond = 2.0),
      sleeper = ms => { sleeps += ms; now += ms * 1000000 },
      clockNs = () => now)
    cli.complete(Seq("a")) // first call: no wait
    cli.complete(Seq("b")) // second: ~500ms interval enforced
    cli.complete(Seq("c"))
    assert(sleeps.size == 2 && sleeps.forall(s => s >= 490 && s <= 510),
      s"expected ~500ms spacing, got $sleeps")
  }

  test("shared limiter registry returns one limiter per key (per-executor rate)") {
    // two "task closures" resolving the same key must share state —
    // otherwise the cluster rate is maxCallsPerSecond × tasks
    val a = Resilience.sharedLimiter("llm:test-endpoint-A", 1e9)
    val b = Resilience.sharedLimiter("llm:test-endpoint-A", 1e9)
    val c = Resilience.sharedLimiter("llm:test-endpoint-B", 1e9)
    assert(a eq b)
    assert(!(a eq c))
  }

  test("matchShapes resolves the session-configured client when none is given") {
    val src = Seq((1L, "a")).toDF("customer_name", "note")
    // default conf → replay client: name-similarity mapping derived
    val mapping = Llm.matchShapes(src, Seq("name"))
    assert(mapping == Seq("name" -> "customer_name"))
    // an explicit client still wins over the conf
    var asked = 0
    val fixed = new Llm.LlmClient {
      override def complete(ps: Seq[String]): Seq[String] = {
        asked += 1; Seq("name=note")
      }
    }
    assert(Llm.matchShapes(src, Seq("name"), fixed) ==
      Seq("name" -> "note") && asked == 1)
  }

  test("extract routes through the session-configured client") {
    val df = Seq((1L, "Paid Acme Ltd today")).toDF("id", "text")
    // default conf → replay client, deterministic
    assert(Llm.clientFromConf(spark).isInstanceOf[Llm.ReplayClient])
    val out = Llm.extract(df, "text", "Extract the company name")
      .select("extracted").as[String].head()
    assert(out.nonEmpty)
    intercept[IllegalArgumentException] {
      spark.conf.set("spark.graft.llm.client", "bogus")
      try Llm.clientFromConf(spark)
      finally spark.conf.unset("spark.graft.llm.client")
    }
  }
}
