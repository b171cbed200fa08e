package graft.sources

/** Graph/REST `$get`/`$put` seam (reference `builtin.cljc:1555-1624`).
  *
  * The reference resolves `[ident-type, ident-val]` + out-props against
  * a pathom graph backend over HTTP (and stores `library_fn` entries in
  * a code library DB). This container has no egress, so the resolver is
  * a trait with a recorded-fixture implementation — the same
  * record/replay seam as `Llm.LlmClient`; a production HTTP client
  * implements the same trait and swaps in via [[Graph.resolver]].
  *
  * Ident types and prop names normalize '/' to '_' ("library/fn" ≡
  * "library_fn", "fn/exe" → key "fn_exe"), matching how the reference's
  * tests address the same entities both ways.
  */
object Graph {

  trait GraphResolver extends Serializable {
    /** Resolve the requested props of an entity. Values are strings or
      * string sequences (list-valued props like list_content).
      */
    def get(identType: String, identVal: String,
        props: Seq[String]): Map[String, Any]
    /** Store an entity's props; returns "success" (reference shape). */
    def put(identType: String, identVal: String,
        obj: Map[String, String]): String
  }

  /** In-memory record/replay resolver: `$put` records, `$get` replays;
    * fixtures can be pre-seeded with [[record]]. Mirrors the
    * reference's special case `$get(['db_name','schemaDB'],
    * ['db_connection'])` → a connection token.
    */
  final class ReplayResolver extends GraphResolver {
    private val store =
      scala.collection.concurrent.TrieMap.empty[(String, String),
        Map[String, Any]]

    def record(identType: String, identVal: String,
        props: Map[String, Any]): Unit =
      store.put((norm(identType), identVal), props.map {
        case (k, v) => norm(k) -> v
      })

    override def get(identType: String, identVal: String,
        props: Seq[String]): Map[String, Any] = {
      if (norm(identType) == "db_name" && identVal == "schemaDB")
        return Map("db_connection" -> "_rm_schema-db")
      val entity = store.getOrElse((norm(identType), identVal),
        throw new IllegalArgumentException(
          s"$$get: no recorded entity [$identType, $identVal]"))
      val wanted = props.map(norm)
      if (wanted.isEmpty) entity
      else entity.view.filterKeys(k =>
        wanted.contains(k) || (wanted.contains("fn_exe") && k == "fn_src"))
        .toMap
    }

    override def put(identType: String, identVal: String,
        obj: Map[String, String]): String = {
      if (norm(identType) != "library_fn")
        throw new IllegalArgumentException(
          "Only $put to library_fn currently supported.") // reference msg
      record(identType, identVal, obj)
      "success"
    }
  }

  private def norm(s: String): String = s.replace('/', '_')

  /** Production HTTP skeleton for the pathom-style graph backend the
    * reference talks to (`builtin.cljc:1555-1624`), wrapped in the
    * same retry policy as the LLM transport. NOT reachable by
    * default — [[resolverFromConf]] constructs it only when
    * `spark.graft.graph.resolver=http`; this container has no egress,
    * so CI exercises only the replay resolver.
    */
  final class HttpGraphResolver(endpoint: String,
      policy: graft.llm.Resilience.Policy = graft.llm.Resilience.Policy(),
      timeoutMs: Long = 30000) extends GraphResolver {
    @transient private lazy val http =
      java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofMillis(timeoutMs)).build()

    private def post(body: String): String =
      graft.llm.Resilience.withRetry(policy, Thread.sleep) {
        val req = java.net.http.HttpRequest.newBuilder()
          .uri(java.net.URI.create(endpoint))
          .timeout(java.time.Duration.ofMillis(timeoutMs))
          .header("content-type", "application/json")
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
          .build()
        val resp = http.send(req,
          java.net.http.HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() == 429)
          throw graft.llm.Resilience.RateLimitedException(
            graft.llm.Resilience.retryAfterMs(resp.headers()))
        if (resp.statusCode() / 100 != 2)
          throw new java.io.IOException(
            s"graph endpoint returned ${resp.statusCode()}")
        resp.body()
      }

    // every interpolated value goes through the shared JSON escaper —
    // a quote/newline in an ident or prop must not invalidate the body
    // or inject fields into the op
    private def j(s: String): String = graft.llm.Resilience.jstr(s)

    override def get(identType: String, identVal: String,
        props: Seq[String]): Map[String, Any] = {
      val body = s"""{"op":"get","ident":[${j(identType)},${j(identVal)}],""" +
        s""""props":[${props.map(j).mkString(",")}]}"""
      // response shape is backend-specific; adapt the parse when
      // pointing at a real pathom server
      Map("raw" -> post(body))
    }

    override def put(identType: String, identVal: String,
        obj: Map[String, String]): String = {
      val kv = obj.map { case (k, v) => s"${j(k)}:${j(v)}" }.mkString(",")
      post(s"""{"op":"put","ident":[${j(identType)},${j(identVal)}],""" +
        s""""obj":{$kv}}""")
      "success"
    }
  }

  /** Resolver per session conf: `spark.graft.graph.resolver` = replay
    * (default) | http (+ `spark.graft.graph.endpoint`).
    */
  def resolverFromConf(
      spark: org.apache.spark.sql.SparkSession): GraphResolver =
    spark.conf.get("spark.graft.graph.resolver", "replay") match {
      case "replay" => new ReplayResolver
      case "http" => new HttpGraphResolver(
        spark.conf.get("spark.graft.graph.endpoint",
          "http://localhost:8080/graph"))
      case other => throw new IllegalArgumentException(
        s"spark.graft.graph.resolver must be replay or http, got $other")
    }

  /** Session resolver — tests/production swap implementations here. */
  @volatile var resolver: GraphResolver = new ReplayResolver
}
