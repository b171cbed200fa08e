package graft.llm

/** Production-client resilience for the batched mapPartitions seams
  * (Llm.LlmClient, Graph.GraphResolver): bounded retries with
  * exponential backoff plus a token-interval rate limit, as a
  * decorator over any transport.
  *
  * Everything is deterministic — no randomized jitter — and the sleep
  * is injectable, so LlmSpec drives the full retry/backoff/rate-limit
  * schedule with a fake in-process transport and zero wall-clock
  * waiting. The real HTTP transport ([[HttpLlmClient]]) rides behind
  * the same policy; in this zero-egress container it is never
  * CONSTRUCTED unless a session explicitly sets
  * `spark.graft.llm.client=http` (ReplayClient stays the default).
  */
object Resilience {

  /** @param maxAttempts total tries per batch (first call + retries)
    * @param baseBackoffMs sleep before retry i is base · 2^(i-1)
    * @param maxBackoffMs backoff cap
    * @param maxCallsPerSecond token-interval rate limit across the
    *        client instance (per executor — cluster-wide rate is
    *        maxCallsPerSecond × executors, size it accordingly)
    */
  final case class Policy(maxAttempts: Int = 4, baseBackoffMs: Long = 200,
      maxBackoffMs: Long = 10000, maxCallsPerSecond: Double = 5.0)
      extends Serializable

  /** Minimal interval limiter: call i+1 starts at least
    * 1/maxCallsPerSecond after call i (token bucket of depth 1 — the
    * shape rate-limited batch APIs want; batching in the caller keeps
    * the docs-per-second throughput high).
    */
  final class RateLimiter(maxPerSecond: Double,
      sleeper: Long => Unit, clockNs: () => Long) extends Serializable {
    private var nextFreeNs = 0L
    private val intervalNs = (1e9 / maxPerSecond).toLong
    def acquire(): Unit = synchronized {
      val now = clockNs()
      val at = math.max(now, nextFreeNs)
      nextFreeNs = at + intervalNs
      val waitNs = at - now
      if (waitNs > 0) sleeper((waitNs + 999999) / 1000000)
    }
  }

  /** JSON string literal with full escaping — shared by every HTTP
    * transport body builder (a quote or newline in a value must never
    * produce invalid JSON or inject fields into the request).
    */
  def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** JVM-wide limiter registry. A client captured in a mapPartitions
    * closure is DESERIALIZED once per task — an instance-held limiter
    * would therefore rate-limit per task, and an executor running N
    * concurrent tasks would hit the endpoint at N× the configured
    * rate. Tasks that resolve their limiter here by key share ONE
    * limiter per executor JVM, making the per-executor sizing in
    * [[Policy.maxCallsPerSecond]]'s doc actually true.
    */
  private val sharedLimiters =
    new java.util.concurrent.ConcurrentHashMap[String, RateLimiter]()

  def sharedLimiter(key: String, maxPerSecond: Double): RateLimiter =
    sharedLimiters.computeIfAbsent(key,
      _ => new RateLimiter(maxPerSecond, Thread.sleep(_),
        () => System.nanoTime()))

  /** Parse an HTTP Retry-After header (delta-seconds form only — the
    * HTTP-date form is rare on rate limiters and not worth a date
    * parser on the executor hot path). */
  def retryAfterMs(headers: java.net.http.HttpHeaders): Option[Long] = {
    val v = headers.firstValue("retry-after")
    if (v.isPresent) v.get.trim.toLongOption.map(_ * 1000L) else None
  }

  /** HTTP 429 from a transport, carrying the server's Retry-After
    * hint when it sent one — [[withRetry]] honors the hint instead of
    * hammering the endpoint again after a (possibly shorter)
    * exponential backoff.
    */
  final case class RateLimitedException(retryAfterMs: Option[Long])
    extends java.io.IOException("endpoint rate limited (retry-after: " +
      retryAfterMs.map(m => s"${m}ms").getOrElse("unspecified") + ")")

  /** Run `f` under the retry policy: attempt, sleep
    * base·2^(attempt-1) (capped) on failure, rethrow the last error
    * once maxAttempts is exhausted. A [[RateLimitedException]] with a
    * Retry-After hint sleeps at least that long (still capped by
    * maxBackoffMs so a hostile header can't park the task forever).
    */
  def withRetry[T](policy: Policy, sleeper: Long => Unit)(f: => T): T = {
    var attempt = 1
    while (true) {
      try return f
      catch {
        case scala.util.control.NonFatal(e) =>
          if (attempt >= policy.maxAttempts) throw e
          val base = math.min(policy.maxBackoffMs,
            policy.baseBackoffMs << (attempt - 1))
          val backoff = e match {
            case RateLimitedException(Some(ms)) =>
              math.min(policy.maxBackoffMs, math.max(base, ms))
            case _ => base
          }
          sleeper(backoff)
          attempt += 1
      }
    }
    sys.error("unreachable")
  }
}

/** Retry + rate-limit decorator over any [[Llm.LlmClient]] transport.
  * Also enforces the batch protocol: a transport answer whose arity
  * differs from the prompt batch is a (retryable) protocol error —
  * silently zipping a short answer list against prompts would
  * misattribute answers to documents.
  */
/** @param shareKey when set (production: the endpoint), the limiter is
  *        resolved from the JVM-wide registry so every task closure in
  *        an executor shares it; when None (tests with injected
  *        clock/sleeper), the limiter is instance-local and
  *        deterministic.
  */
final class ResilientClient(inner: Llm.LlmClient,
    policy: Resilience.Policy = Resilience.Policy(),
    sleeper: Long => Unit = Thread.sleep,
    clockNs: () => Long = () => System.nanoTime(),
    shareKey: Option[String] = None)
    extends Llm.LlmClient {

  @transient private lazy val limiter = shareKey match {
    case Some(k) => Resilience.sharedLimiter(k, policy.maxCallsPerSecond)
    case None =>
      new Resilience.RateLimiter(policy.maxCallsPerSecond, sleeper, clockNs)
  }

  override def complete(prompts: Seq[String]): Seq[String] =
    Resilience.withRetry(policy, sleeper) {
      limiter.acquire()
      val out = inner.complete(prompts)
      require(out.size == prompts.size,
        s"transport protocol error: ${prompts.size} prompts, " +
          s"${out.size} answers")
      out
    }
}

/** Skeleton of the production HTTP transport (the reference calls its
  * LLM over REST, builtin.cljc:2533-2738). One JSON POST per batch via
  * java.net.http; the API key comes from an env var NAME (never a
  * value in code or conf). Deliberately NOT reachable by default:
  * [[Llm.clientFromConf]] constructs it only when
  * `spark.graft.llm.client=http` — this container has no egress, so
  * CI exercises the policy through fakes (LlmSpec) and the replay
  * client everywhere else.
  */
final class HttpLlmClient(endpoint: String, model: String,
    apiKeyEnv: String, timeoutMs: Long = 60000) extends Llm.LlmClient {

  @transient private lazy val http = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofMillis(timeoutMs)).build()

  private def jstr(s: String): String = Resilience.jstr(s)

  override def complete(prompts: Seq[String]): Seq[String] = {
    val body = prompts.map(p => s"""{"model":${jstr(model)},""" +
      s""""prompt":${jstr(p)}}""").mkString("[", ",", "]")
    val req = java.net.http.HttpRequest.newBuilder()
      .uri(java.net.URI.create(endpoint))
      .timeout(java.time.Duration.ofMillis(timeoutMs))
      .header("content-type", "application/json")
      .header("authorization",
        "Bearer " + sys.env.getOrElse(apiKeyEnv, ""))
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
      .build()
    val resp = http.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() == 429)
      throw Resilience.RateLimitedException(
        Resilience.retryAfterMs(resp.headers()))
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"LLM endpoint returned ${resp.statusCode()}")
    // expected response: JSON array of answer strings, one per prompt
    parseStringArray(resp.body())
  }

  /** Tiny JSON string-array reader (["a","b",...]) — the full response
    * shape is provider-specific; adapt here when pointing at a real
    * endpoint.
    */
  private def parseStringArray(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = s.indexOf('[') + 1
    val sb = new StringBuilder
    var inStr = false
    while (i < s.length && !(s(i) == ']' && !inStr)) {
      val c = s(i)
      if (!inStr) { if (c == '"') { inStr = true; sb.clear() } }
      else if (c == '\\' && i + 1 < s.length) {
        s(i + 1) match {
          case '"' => sb += '"'
          case '\\' => sb += '\\'
          case 'n' => sb += '\n'
          case 'r' => sb += '\r'
          case 't' => sb += '\t'
          case 'u' if i + 5 < s.length =>
            sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar
            i += 4
          case other => sb += other
        }
        i += 1
      }
      else if (c == '"') { inStr = false; out += sb.toString }
      else sb += c
      i += 1
    }
    out.toSeq
  }
}
