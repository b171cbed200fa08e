package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** The `query{}` Datalog compiler (SURVEY.md §2.8; reference semantics at
  * `builtin.cljc:1695-1838`, `rewrite.cljc:253-307`).
  *
  * Each triple pattern filters the EAV frame and projects its qvars; the
  * conjunction is a chain of natural equi-joins on shared qvar columns —
  * exactly the reference's Datalog semantics (conjunctive equi-joins by
  * shared qvars, implicit distinct, wildcard attr position, predicate
  * filters), but the join *planning* is Catalyst's: join reordering,
  * broadcast selection for small pattern frames, pushdown of the `a ===`
  * filters to the scan (partition pruning when triples are stored
  * partitioned by attribute).
  *
  * Binding representation: every qvar binds a struct<v: string, vt:
  * string> (canonical value + type tag, matching Shred's encoding), so
  * joins distinguish `"5"` the string from `5` the number, mirroring the
  * typed EAV store. Entity-position qvars bind <id, "ref">.
  */
object QueryCompiler {

  sealed trait Term
  /** `?name` */
  final case class V(name: String) extends Term
  /** literal in the pattern */
  final case class C(value: Any) extends Term
  /** `_` — matches anything, binds nothing */
  case object W extends Term

  /** `[<src> ?e :attr v]` — src names a frame in the sources map
    * (multi-DB queries, reference `rewrite.cljc:292-301`).
    */
  final case class Pattern(e: Term, a: Term, v: Term, src: String = "default")

  /** Canonical encoding of a pattern constant (must match Shred.canon). */
  private def canonConst(x: Any): (String, String) = x match {
    case s: String => (s, "str")
    case b: Boolean => (b.toString, "bool")
    case n: Double =>
      (if (n == n.longValue.toDouble) n.longValue.toString else n.toString,
        "num")
    case n: Float =>
      (if (n == n.longValue.toFloat) n.longValue.toString else n.toString,
        "num")
    case n: Number => (n.toString, "num")
    case other => (other.toString, "str")
  }

  /** Compile one pattern to a frame with one struct column per qvar. */
  private def patternFrame(triples: DataFrame, p: Pattern): DataFrame = {
    var f = triples
    p.a match {
      case C(name) => f = f.filter(col("a") === name.toString)
      case _ => ()
    }
    p.v match {
      case C(value) =>
        val (v, vt) = canonConst(value)
        f = f.filter(col("v") === v && col("vt") === vt)
      case _ => ()
    }
    val cols = Seq.newBuilder[Column]
    p.e match {
      case V(n) => cols += struct(col("e").as("v"), lit("ref").as("vt")).as(n)
      case C(id) => f = f.filter(col("e") === id.toString)
      case W => ()
    }
    p.a match {
      case V(n) => cols += struct(col("a").as("v"), lit("str").as("vt")).as(n)
      case _ => ()
    }
    p.v match {
      case V(n) => cols += struct(col("v").as("v"), col("vt").as("vt")).as(n)
      case _ => ()
    }
    f.select(cols.result(): _*)
  }

  private def vars(p: Pattern): Seq[String] =
    Seq(p.e, p.a, p.v).collect { case V(n) => n }

  /** Run a query.
    *
    * @param sources    named triple frames (multi-source joins)
    * @param patterns   the `:where` conjunction
    * @param predicates filters over bound qvars — receive name→Column
    *                   (the canonical string value); use `num()` for the
    *                   numeric view
    * @param keepDBid   keep entity-position qvars in the output
    *                   (`<|keepDBid: true|>`, reference builtin.cljc:1752-1758)
    * @param boxedPredicates filters that receive name→struct<v,vt>
    *                   (canonical value + type tag) — the typed view the
    *                   text frontend uses to restore native-typed qvar
    *                   bindings inside predicates
    * @return binding sets: one string column per value/attr qvar
    *         (canonical encoding), distinct (Datalog set semantics)
    */
  def run(sources: Map[String, DataFrame], patterns: Seq[Pattern],
      predicates: Seq[Map[String, Column] => Column] = Nil,
      keepDBid: Boolean = false,
      boxedPredicates: Seq[Map[String, Column] => Column] = Nil)
      : DataFrame = {
    val boxed = runBoxed(sources, patterns, predicates, keepDBid,
      boxedPredicates)
    boxed.select(boxed.columns.toSeq
      .map(c => boxed(c).getField("v").as(c)): _*)
  }

  /** Like run but keeps the boxed struct<v,vt> binding columns — the
    * typed view (used by the text frontend's unboxing bridge).
    */
  def runBoxed(sources: Map[String, DataFrame], patterns: Seq[Pattern],
      predicates: Seq[Map[String, Column] => Column] = Nil,
      keepDBid: Boolean = false,
      boxedPredicates: Seq[Map[String, Column] => Column] = Nil)
      : DataFrame = {
    require(patterns.nonEmpty, "query{} needs at least one pattern")
    val joined = patterns.map(p => patternFrame(sources(p.src), p))
      .reduceLeft { (acc, next) =>
        val shared = acc.columns.toSet.intersect(next.columns.toSet).toSeq
        if (shared.nonEmpty) acc.join(next, shared)
        else acc.crossJoin(next)
      }
    val bound: Map[String, Column] =
      joined.columns.map(n => n -> joined(n).getField("v")).toMap
    val boundBoxed: Map[String, Column] =
      joined.columns.map(n => n -> joined(n)).toMap
    val filtered = boxedPredicates.foldLeft(
      predicates.foldLeft(joined)((f, p) => f.filter(p(bound))))(
      (f, p) => f.filter(p(boundBoxed)))
    // Datalog set semantics over ALL found qvars, THEN drop entity vars
    // (so residual duplicate bsets survive, as in the reference).
    val entityVars = patterns.flatMap(p => p.e match {
      case V(n) => Some(n); case _ => None
    }).toSet
    val distinctAll = filtered.distinct()
    val out = distinctAll.columns
      .filter(c => keepDBid || !entityVars.contains(c))
    distinctAll.select(out.toSeq.map(distinctAll(_)): _*)
  }

  /** Single-source convenience. */
  def run(triples: DataFrame, patterns: Seq[Pattern]): DataFrame =
    run(Map("default" -> triples), patterns)

  // ---------- direct (unshredded) compilation ----------

  /** A document source compiled WITHOUT the EAV detour (SURVEY §2.8
    * "skip EAV when the shape is known"): patterns over the same
    * entity var collapse into ONE projection over the document frame —
    * no explode, no self-joins. The scan reads only referenced
    * columns; a k-pattern single-entity query is a single narrow scan.
    */
  final case class DocSource(df: DataFrame, idCol: String)

  /** Run a query over document frames directly. Falls back on the
    * requirement that attribute positions are constants (wildcard
    * attrs need the EAV form). Output encoding matches `run` exactly
    * (canonical strings, distinct-then-drop-entity semantics).
    */
  def runDocs(sources: Map[String, DocSource], patterns: Seq[Pattern],
      predicates: Seq[Map[String, Column] => Column] = Nil,
      keepDBid: Boolean = false,
      boxedPredicates: Seq[Map[String, Column] => Column] = Nil)
      : DataFrame = {
    val boxed = runDocsBoxed(sources, patterns, predicates, keepDBid,
      boxedPredicates)
    boxed.select(boxed.columns.toSeq
      .map(c => boxed(c).getField("v").as(c)): _*)
  }

  /** `runDocs` keeping the boxed struct<v,vt> binding columns — used by
    * the text frontend's typed restore (QueryBridge), which pairs it
    * with `docVarTypes` to type the output statically.
    */
  def runDocsBoxed(sources: Map[String, DocSource], patterns: Seq[Pattern],
      predicates: Seq[Map[String, Column] => Column] = Nil,
      keepDBid: Boolean = false,
      boxedPredicates: Seq[Map[String, Column] => Column] = Nil)
      : DataFrame = {
    require(patterns.nonEmpty, "query{} needs at least one pattern")
    require(patterns.forall(_.a.isInstanceOf[C]),
      "runDocs requires constant attributes; use run() for wildcards")

    // group patterns by (source, entity var): each group is ONE
    // projection over that source's frame
    val grouped = patterns.groupBy(p => (p.src, p.e))
    val frames = grouped.map { case ((srcName, eTerm), pats) =>
      val src = sources(srcName)
      var f = src.df
      val cols = Seq.newBuilder[Column]
      eTerm match {
        case V(n) =>
          cols += struct(col(src.idCol).cast("string").as("v"),
            lit("ref").as("vt")).as(n)
        case C(id) => f = f.filter(col(src.idCol).cast("string") ===
          id.toString)
        case W => ()
      }
      pats.foreach { p =>
        val C(attrName) = p.a: @unchecked
        val attr = attrName.toString
        val dt = src.df.schema(attr).dataType
        p.v match {
          case C(value) =>
            val (v, _) = canonConst(value)
            f = f.filter(canonCol(col(attr), dt) === v)
          case V(n) =>
            f = f.filter(col(attr).isNotNull) // EAV has no null triples
            cols += struct(canonCol(col(attr), dt).as("v"),
              lit(typeNameOf(dt)).as("vt")).as(n)
          case W => f = f.filter(col(attr).isNotNull)
        }
      }
      f.select(cols.result(): _*)
    }.toSeq

    val joined = frames.reduceLeft { (acc, next) =>
      val shared = acc.columns.toSet.intersect(next.columns.toSet).toSeq
      if (shared.nonEmpty) acc.join(next, shared) else acc.crossJoin(next)
    }
    val bound: Map[String, Column] =
      joined.columns.map(n => n -> joined(n).getField("v")).toMap
    val boundBoxed: Map[String, Column] =
      joined.columns.map(n => n -> joined(n)).toMap
    val filtered = boxedPredicates.foldLeft(
      predicates.foldLeft(joined)((f, p) => f.filter(p(bound))))(
      (f, p) => f.filter(p(boundBoxed)))
    val entityVars = patterns.flatMap(_.e match {
      case V(n) => Some(n); case _ => None
    }).toSet
    val distinctAll = filtered.distinct()
    val out = distinctAll.columns
      .filter(c => keepDBid || !entityVars.contains(c))
    distinctAll.select(out.toSeq.map(distinctAll(_)): _*)
  }

  /** Static Spark types feeding each qvar on the direct path: value-
    * position qvars collect their source column types; entity-position
    * qvars are refs (string ids). Lets the typed restore skip its
    * runtime type-facts job for columns whose type is provable.
    */
  def docVarTypes(sources: Map[String, DocSource],
      patterns: Seq[Pattern]): Map[String, Set[DataType]] = {
    import org.apache.spark.sql.types.StringType
    val acc = scala.collection.mutable.Map.empty[String, Set[DataType]]
    patterns.foreach { p =>
      p.e match {
        case V(n) => acc(n) = acc.getOrElse(n, Set.empty) + StringType
        case _ => ()
      }
      (p.a, p.v) match {
        case (C(attr), V(n)) =>
          val dt = sources(p.src).df.schema(attr.toString).dataType
          acc(n) = acc.getOrElse(n, Set.empty) + dt
        case _ => ()
      }
    }
    acc.toMap
  }

  /** Canonical string of a document column (must match Shred.canon). */
  private def canonCol(c: Column, dt: org.apache.spark.sql.types.DataType)
      : Column = {
    import org.apache.spark.sql.types._
    dt match {
      case DoubleType | FloatType | _: DecimalType =>
        when(c === c.cast("long").cast(dt), c.cast("long").cast("string"))
          .otherwise(c.cast("string"))
      case _ => c.cast("string")
    }
  }

  private def typeNameOf(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case _: NumericType => "num"
      case BooleanType => "bool"
      case _ => "str"
    }
  }

  /** Numeric view of a bound qvar inside a predicate. */
  def num(c: Column): Column = c.cast("double")
}
