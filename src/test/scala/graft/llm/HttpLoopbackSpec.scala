package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.net.InetSocketAddress
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.nio.charset.StandardCharsets.UTF_8

/** Loopback-HTTP integration tests: an in-process JDK HttpServer on
  * 127.0.0.1 drives the REAL production transports — HttpLlmClient /
  * HttpGraphResolver under the ResilientClient / withRetry policy —
  * through actual TCP, JSON bodies, status codes, and headers. No
  * egress: everything stays on the loopback interface. This is the
  * test the replay seam cannot provide: it proves the
  * `spark.graft.llm.client=http` path works end-to-end (task-closure
  * serialization, batching, body escaping, auth header, response
  * parse, retry/rate-limit behavior), not just the policy math.
  */
class HttpLoopbackSpec extends SparkSpec {

  /** Scripted loopback server: pops the next scripted response per
    * request (the last one repeats), logs every (body, headers). A
    * script entry of (status, headers, null) echoes a well-formed
    * answer array whose arity matches the request's prompt count.
    */
  private final class Loopback(
      script: (Int, Map[String, String], String)*) {
    val received =
      new java.util.concurrent.CopyOnWriteArrayList[(String, Map[String, String])]
    private val remaining =
      new java.util.concurrent.ConcurrentLinkedQueue[(Int, Map[String, String], String)]
    script.foreach(remaining.add)
    private val last = script.last
    private val server = HttpServer.create(
      new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      val hdrs = {
        val m = scala.collection.mutable.Map[String, String]()
        ex.getRequestHeaders.forEach((k, v) =>
          m(k.toLowerCase) = v.get(0))
        m.toMap
      }
      received.add((body, hdrs))
      val (status, outHdrs, rawAnswer) =
        Option(remaining.poll()).getOrElse(last)
      val answer = if (rawAnswer != null) rawAnswer else {
        // arity-matching echo: one answer per "prompt" in the batch
        val n = "\"prompt\":".r.findAllIn(body).size
        (1 to n).map(i => s""""ans$i"""").mkString("[", ",", "]")
      }
      outHdrs.foreach { case (k, v) =>
        ex.getResponseHeaders.add(k, v) }
      val bytes = answer.getBytes(UTF_8)
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    def url(path: String = "/llm") =
      s"http://127.0.0.1:${server.getAddress.getPort}$path"
    def stop(): Unit = server.stop(0)
  }

  private val ok = (200, Map.empty[String, String], null: String)

  test("extract runs end-to-end through the http client from session conf") {
    val srv = new Loopback(ok)
    try {
      spark.conf.set("spark.graft.llm.client", "http")
      spark.conf.set("spark.graft.llm.endpoint", srv.url())
      spark.conf.set("spark.graft.llm.baseBackoffMs", "1")
      spark.conf.set("spark.graft.llm.maxCallsPerSecond", "10000")
      import spark.implicits._
      val docs = Seq((1L, "alpha text"), (2L, "beta text"),
        (3L, "alpha text"), (4L, "gamma text"))
        .toDF("doc_id", "text")
      val out = Llm.extract(docs, "text", "Summarize.")
        .orderBy("doc_id")
        .select("doc_id", "extracted").collect()
      assert(out.length == 4 && out.forall(r =>
        r.getString(1).startsWith("ans")))
      // identical texts deduplicate to one prompt and share the answer
      assert(out(0).getString(1) == out(2).getString(1))
      // the wire saw real JSON bodies with the auth + content-type
      // headers; total prompts across batches = 3 unique texts
      assert(srv.received.size() >= 1)
      import scala.jdk.CollectionConverters._
      val reqs = srv.received.asScala
      assert(reqs.map(r =>
        "\"prompt\":".r.findAllIn(r._1).size).sum == 3)
      assert(reqs.forall(_._2("content-type") == "application/json"))
      assert(reqs.forall(_._2("authorization").startsWith("Bearer")))
      assert(reqs.forall(_._1.contains("Summarize.")))
    } finally {
      srv.stop()
      spark.conf.unset("spark.graft.llm.client")
      spark.conf.unset("spark.graft.llm.endpoint")
      spark.conf.unset("spark.graft.llm.baseBackoffMs")
      spark.conf.unset("spark.graft.llm.maxCallsPerSecond")
    }
  }

  test("transport retries a 500 and recovers on the next attempt") {
    val srv = new Loopback((500, Map.empty, "boom"), ok)
    try {
      val cli = new ResilientClient(
        new HttpLlmClient(srv.url(), "m", "NO_SUCH_ENV"),
        Resilience.Policy(maxAttempts = 3, baseBackoffMs = 1),
        sleeper = _ => ())
      assert(cli.complete(Seq("p1", "p2")) == Seq("ans1", "ans2"))
      assert(srv.received.size() == 2)
    } finally srv.stop()
  }

  test("429 with Retry-After sleeps at least the hinted interval") {
    val srv = new Loopback(
      (429, Map("Retry-After" -> "2"), "slow down"), ok)
    try {
      val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
      val cli = new ResilientClient(
        new HttpLlmClient(srv.url(), "m", "NO_SUCH_ENV"),
        Resilience.Policy(maxAttempts = 3, baseBackoffMs = 1,
          maxCallsPerSecond = 10000),
        sleeper = sleeps += _)
      assert(cli.complete(Seq("p")) == Seq("ans1"))
      // the backoff honored the server's 2s hint, not the 1ms base
      assert(sleeps.exists(_ >= 2000),
        s"expected a >=2000ms sleep from Retry-After, got $sleeps")
      assert(srv.received.size() == 2)
    } finally srv.stop()
  }

  test("malformed JSON and short answer arrays are retryable protocol errors") {
    val srv = new Loopback(
      (200, Map.empty, "this is not json"),
      (200, Map.empty, """["only one"]"""),
      ok)
    try {
      val cli = new ResilientClient(
        new HttpLlmClient(srv.url(), "m", "NO_SUCH_ENV"),
        Resilience.Policy(maxAttempts = 4, baseBackoffMs = 1),
        sleeper = _ => ())
      assert(cli.complete(Seq("p1", "p2")) == Seq("ans1", "ans2"))
      assert(srv.received.size() == 3) // garbage, short array, good
    } finally srv.stop()
  }

  test("persistent failure exhausts maxAttempts and rethrows") {
    val srv = new Loopback((503, Map.empty, "down"))
    try {
      val cli = new ResilientClient(
        new HttpLlmClient(srv.url(), "m", "NO_SUCH_ENV"),
        Resilience.Policy(maxAttempts = 3, baseBackoffMs = 1),
        sleeper = _ => ())
      val e = intercept[java.io.IOException] { cli.complete(Seq("p")) }
      assert(e.getMessage.contains("503"))
      assert(srv.received.size() == 3)
    } finally srv.stop()
  }

  test("graph resolver gets/puts through loopback with escaped JSON bodies") {
    val srv = new Loopback(
      (500, Map.empty, "flaky"),
      (200, Map.empty, """{"fn_src":"1 + 1"}"""),
      (200, Map.empty, """{"ok":true}"""))
    try {
      val res = new graft.sources.Graph.HttpGraphResolver(srv.url("/graph"),
        graft.llm.Resilience.Policy(maxAttempts = 3, baseBackoffMs = 1))
      val got = res.get("library/fn", "quote\"and\nnewline",
        Seq("fn_src"))
      assert(got("raw").toString.contains("fn_src"))
      assert(srv.received.size() == 2) // 500 then success
      val body = srv.received.get(1)._1
      // the hostile ident neither broke the JSON nor injected fields
      assert(body.contains("\\\"") && body.contains("\\n"))
      assert(body.contains(""""op":"get""""))
      res.put("library_fn", "f1", Map("src" -> "a\"b"))
      val putBody = srv.received.get(2)._1
      assert(putBody.contains(""""op":"put"""") &&
        putBody.contains("a\\\"b"))
    } finally srv.stop()
  }

  test("resolverFromConf and clientFromConf construct the http transports") {
    spark.conf.set("spark.graft.graph.resolver", "http")
    spark.conf.set("spark.graft.graph.endpoint", "http://127.0.0.1:1/x")
    try assert(graft.sources.Graph.resolverFromConf(spark)
      .isInstanceOf[graft.sources.Graph.HttpGraphResolver])
    finally {
      spark.conf.unset("spark.graft.graph.resolver")
      spark.conf.unset("spark.graft.graph.endpoint")
    }
    spark.conf.set("spark.graft.llm.client", "http")
    spark.conf.set("spark.graft.llm.endpoint", "http://127.0.0.1:1/x")
    try assert(Llm.clientFromConf(spark).isInstanceOf[ResilientClient])
    finally {
      spark.conf.unset("spark.graft.llm.client")
      spark.conf.unset("spark.graft.llm.endpoint")
    }
  }
}
