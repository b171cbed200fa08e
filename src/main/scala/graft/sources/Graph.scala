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

  /** Session resolver — tests/production swap implementations here. */
  @volatile var resolver: GraphResolver = new ReplayResolver
}
