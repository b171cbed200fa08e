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

  /** Compile one pattern to a frame with one struct column per qvar
    * (the legacy canonical-string form, kept as the differential
    * authority for [[runBoxed]]'s typed route). A qvar repeated WITHIN
    * the pattern ([?x :a ?x]) projects once; later occurrences become
    * row-local struct-equality filters — the same semantics the
    * across-pattern join gives shared qvars (struct `===` treats null
    * fields as equal, matching join/distinct).
    */
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
    val seen = scala.collection.mutable.Map.empty[String, Column]
    def bind(n: String, s: Column): Unit = seen.get(n) match {
      case Some(prev) => f = f.filter(prev === s)
      case None => seen(n) = s; cols += s.as(n)
    }
    p.e match {
      case V(n) => bind(n, struct(col("e").as("v"), lit("ref").as("vt")))
      case C(id) => f = f.filter(col("e") === id.toString)
      case W => ()
    }
    p.a match {
      case V(n) => bind(n, struct(col("a").as("v"), lit("str").as("vt")))
      case _ => ()
    }
    p.v match {
      case V(n) => bind(n, struct(col("v").as("v"), col("vt").as("vt")))
      case _ => ()
    }
    f.select(cols.result(): _*)
  }

  /** Typed twin of [[patternFrame]]: four flat native columns per qvar
    * ([[TypedEnc]]), encoded row-locally AFTER the pattern's constant
    * filters, so the join/distinct exchanges above carry natives. The
    * within-pattern repeated-qvar filter compares the encoded tuples —
    * all four columns are non-null, so plain conjunctive equality is
    * exactly the legacy struct equality.
    */
  private def patternFrameTyped(triples: DataFrame, p: Pattern)
      : DataFrame = {
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
    val seen = scala.collection.mutable.Map.empty[String, Seq[Column]]
    def bind(n: String, v: Column, vt: Column): Unit = {
      val enc = TypedEnc.encode(n, v, vt)
      seen.get(n) match {
        case Some(prev) =>
          f = f.filter(prev.zip(enc).map { case (a, b) => a === b }
            .reduce(_ && _))
        case None => seen(n) = enc; cols ++= enc
      }
    }
    p.e match {
      case V(n) => bind(n, col("e"), lit("ref"))
      case C(id) => f = f.filter(col("e") === id.toString)
      case W => ()
    }
    p.a match {
      case V(n) => bind(n, col("a"), lit("str"))
      case _ => ()
    }
    p.v match {
      case V(n) => bind(n, col("v"), col("vt"))
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
    *
    * Planning happens in two tiers:
    *
    *  1. **Shred-aware regrouping** ([[regroupShredded]]): when every
    *     source provably IS a shred of a document frame
    *     (Shred.unshredSource) and every pattern names a constant,
    *     shredded, top-level scalar attribute, the query compiles over
    *     the DOCUMENTS (runDocsNative → runDocsBoxed): same-entity
    *     patterns fuse into one projection, so the fact-scale triple
    *     self-join disappears entirely (measured at sf100: the 2-
    *     pattern whole-lineitem conjunction was 914 s / 26 GB shuffled
    *     as an EAV self-join, vs the direct profile's in-band cost).
    *  2. Otherwise the typed EAV route ([[runBoxedEav]]): each pattern
    *     frame encodes its bindings as [[TypedEnc]]'s four flat
    *     non-null columns (row-local, after the constant filters), the
    *     join chain and the Datalog distinct run on those natives — a
    *     numeric/id binding's exchange key is (byte, long, "", "")
    *     instead of two strings — and the boxed struct<v,vt> is
    *     decoded AFTER the distinct as a row-local projection.
    *
    * Both tiers are bit-identical to [[runBoxedCanonical]], which is
    * retained as the differential authority (EavTypedProps pins the
    * typed route; EavRegroupSpec pins the regrouped one).
    */
  def runBoxed(sources: Map[String, DataFrame], patterns: Seq[Pattern],
      predicates: Seq[Map[String, Column] => Column] = Nil,
      keepDBid: Boolean = false,
      boxedPredicates: Seq[Map[String, Column] => Column] = Nil)
      : DataFrame = {
    require(patterns.nonEmpty, "query{} needs at least one pattern")
    regroupShredded(sources, patterns, predicates, keepDBid,
        boxedPredicates)
      .getOrElse(runBoxedEav(sources, patterns, predicates, keepDBid,
        boxedPredicates))
  }

  /** Tier-1 planning of [[runBoxed]]: compile a constant-attribute
    * query over explicitly-shredded sources directly against the
    * underlying document frames. Sound only when the regrouped read
    * provably reproduces the triples (see Shred.unshredSource for the
    * plan-shape and non-null-id conditions); per pattern the attribute
    * must additionally be
    *
    *  - among the shredded top-level names, of a scalar type whose
    *    document canon equals the generator canon (string/boolean/
    *    numeric — date/timestamp/binary render differently in the
    *    generator, UnshredEav.supportedScalar's argument), and
    *  - absent from every NESTED position of the schema: a name that
    *    also occurs under a struct matches sub-entity triples in the
    *    EAV form, which a top-level projection cannot see.
    *
    * A missing attribute also declines: the EAV form correctly yields
    * the empty binding set there, while runDocs would throw.
    */
  private def regroupShredded(sources: Map[String, DataFrame],
      patterns: Seq[Pattern],
      predicates: Seq[Map[String, Column] => Column],
      keepDBid: Boolean,
      boxedPredicates: Seq[Map[String, Column] => Column])
      : Option[DataFrame] = {
    import org.apache.spark.sql.types._
    if (!patterns.forall(_.a.isInstanceOf[C])) return None
    val det = sources.map { case (n, df) =>
      n -> graft.shred.Shred.unshredSource(df)
    }
    if (det.values.exists(_.isEmpty)) return None
    def nestedField(dt: DataType, name: String): Boolean = dt match {
      case st: StructType => st.fields.exists(f =>
        f.name == name || nestedField(f.dataType, name))
      case ArrayType(et, _) => nestedField(et, name)
      case MapType(k, v, _) => nestedField(k, name) ||
        nestedField(v, name)
      case _ => false
    }
    def scalarCanonSafe(dt: DataType): Boolean = dt match {
      case StringType | BooleanType => true
      case _: NumericType => true
      case _ => false
    }
    val ok = patterns.forall { p =>
      val (doc, _, shredded) = det(p.src).get
      val attr = p.a.asInstanceOf[C].value.toString
      shredded.contains(attr) &&
        doc.schema.fields.exists(f => f.name == attr &&
          scalarCanonSafe(f.dataType)) &&
        !doc.schema.fields.exists(f =>
          nestedField(f.dataType, attr))
    }
    if (!ok) return None
    val ent = "__graft_regroup_e"
    val docs = det.map { case (n, d) =>
      import org.apache.spark.sql.catalyst.expressions.{Cast,
        KnownNotNull}
      import org.apache.spark.sql.graftglue.ColumnGlue
      val (doc, eExpr, _) = d.get
      if (doc.columns.contains(ent)) return None
      // keep the id native when the cast to the shred's string id is
      // the identity canon (integral inner) — the native path's
      // 8-byte join key; otherwise bind the string form
      val idExpr = eExpr match {
        case c: Cast if (c.child.dataType match {
          case ByteType | ShortType | IntegerType | LongType => true
          case _ => false
        }) => c.child
        case e => e
      }
      // the generator emits NOTHING for a null entity id, so null-id
      // document rows must not participate; after the filter the
      // column is provably non-null (KnownNotNull), which is what
      // runDocsNative's id eligibility needs on parquet sources
      // (their schemas mark every column nullable)
      val base =
        if (eExpr.nullable)
          doc.filter(ColumnGlue.column(idExpr).isNotNull)
        else doc
      val guarded =
        if (idExpr.nullable) KnownNotNull(idExpr) else idExpr
      n -> DocSource(base.withColumn(ent,
        ColumnGlue.column(guarded)), ent)
    }
    Some(runDocsNative(docs, patterns, predicates, keepDBid,
        boxedPredicates)
      .getOrElse(runDocsBoxed(docs, patterns, predicates, keepDBid,
        boxedPredicates)))
  }

  /** Tier-2 of [[runBoxed]]: the typed EAV execution over the triple
    * frames themselves (native-encoded bindings through the join chain
    * and the Datalog distinct).
    */
  private[graft] def runBoxedEav(sources: Map[String, DataFrame],
      patterns: Seq[Pattern],
      predicates: Seq[Map[String, Column] => Column] = Nil,
      keepDBid: Boolean = false,
      boxedPredicates: Seq[Map[String, Column] => Column] = Nil)
      : DataFrame = {
    require(patterns.nonEmpty, "query{} needs at least one pattern")
    val joined = patterns.map(p => patternFrameTyped(sources(p.src), p))
      .reduceLeft { (acc, next) =>
        val shared = TypedEnc.varsOf(acc).toSet
          .intersect(TypedEnc.varsOf(next).toSet).toSeq
        if (shared.nonEmpty)
          acc.join(next, shared.flatMap(TypedEnc.colNames))
        else acc.crossJoin(next)
      }
    val boundBoxed: Map[String, Column] = TypedEnc.varsOf(joined)
      .map(n => n -> TypedEnc.boxedOf(joined, n)).toMap
    val bound: Map[String, Column] =
      boundBoxed.map { case (n, s) => n -> s.getField("v") }
    val filtered = boxedPredicates.foldLeft(
      predicates.foldLeft(joined)((f, p) => f.filter(p(bound))))(
      (f, p) => f.filter(p(boundBoxed)))
    // Datalog set semantics over ALL found qvars — on the native
    // encoding — THEN drop entity vars and decode to boxed structs
    // (so residual duplicate bsets survive, as in the reference).
    val entityVars = patterns.flatMap(p => p.e match {
      case V(n) => Some(n); case _ => None
    }).toSet
    val distinctAll = filtered.distinct()
    val out = TypedEnc.varsOf(distinctAll)
      .filter(c => keepDBid || !entityVars.contains(c))
    distinctAll.select(out.map(n =>
      TypedEnc.boxedOf(distinctAll, n).as(n)): _*)
  }

  /** The legacy canonical-string execution of [[runBoxed]]: binding
    * structs <v: string, vt: string> travel through the join chain and
    * the distinct. Retained as the differential authority the typed
    * route is property-checked against; not used by any query path.
    */
  private[graft] def runBoxedCanonical(sources: Map[String, DataFrame],
      patterns: Seq[Pattern],
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

  /** Direct-path pattern grouping: one group per (source, entity VAR
    * or entity CONSTANT) — those conjoin row-locally over one entity —
    * but each wildcard-entity pattern alone: `_` binds nothing, so
    * wildcard-entity patterns are mutually independent and their
    * binding sets cross-product, like the EAV path's disjoint pattern
    * frames.
    */
  private def groupPatterns(patterns: Seq[Pattern])
      : Seq[(String, Term, Seq[Pattern])] =
    patterns.zipWithIndex.groupBy { case (p, i) =>
      (p.src, p.e match { case W => Left(i); case t => Right(t) })
    }.toSeq
      // deterministic first-occurrence order: group order decides the
      // join chain and therefore the output column order
      .sortBy { case (_, ps) => ps.head._2 }
      .map { case (_, ps) => (ps.head._1.src, ps.head._1.e,
        ps.map(_._1)) }

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
    // native-typed route when provable (join/distinct on source types;
    // result-identical boxing afterwards), boxed otherwise
    val boxed = runDocsNative(sources, patterns, predicates, keepDBid,
        boxedPredicates)
      .getOrElse(runDocsBoxed(sources, patterns, predicates, keepDBid,
        boxedPredicates))
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
    // projection over that source's frame. A var REPEATED within a
    // group ([?e :p ?x] [?e :r ?x] — "p equals r for this entity")
    // projects once and turns later occurrences into row-local
    // equality filters on the boxed encoding, exactly what the EAV
    // path's join-on-shared-qvar does for the same conjunction
    // (a second same-named projection would be an ambiguous column).
    // A WILDCARD entity is its own group per pattern: `_` binds
    // nothing, so [_ :a ?x] [_ :b ?y] are independent patterns whose
    // bindings cross-product (the EAV authority's semantics) — merging
    // them into one projection would silently conjoin them row-locally
    // (caught by the wildcard-entity differential in DirectQuerySpec).
    val grouped = groupPatterns(patterns)
    val frames = grouped.map { case (srcName, eTerm, pats) =>
      val src = sources(srcName)
      var f = src.df
      val cols = Seq.newBuilder[Column]
      val seen = scala.collection.mutable.Map.empty[String, Column]
      eTerm match {
        case V(n) =>
          val s = struct(col(src.idCol).cast("string").as("v"),
            lit("ref").as("vt"))
          seen(n) = s
          cols += s.as(n)
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
            // vt tag must match statically: a "5"-holding STRING column
            // never matches the NUMBER constant 5 in the EAV form
            // (the triple's vt is "str", the constant's "num"), so a
            // kind-mismatched constant folds to an empty pattern
            val (v, vt) = canonConst(value)
            f = if (typeNameOf(dt) == vt)
              f.filter(canonCol(col(attr), dt) === v)
            else f.filter(lit(false))
          case V(n) =>
            f = f.filter(col(attr).isNotNull) // EAV has no null triples
            val s = struct(canonCol(col(attr), dt).as("v"),
              lit(typeNameOf(dt)).as("vt"))
            seen.get(n) match {
              case Some(prev) => f = f.filter(prev === s)
              case None =>
                seen(n) = s
                cols += s.as(n)
            }
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

  /** Native-typed direct path — the fact-table route. Binding columns
    * keep their SOURCE Spark types through the join chain and the
    * Datalog distinct, so those shuffles carry 8-byte natives instead
    * of canonical-string structs (the boxed form shuffles two strings
    * per qvar — at 60M lineitem rows that was the spill-bound profile
    * BENCH_sf10_r13 attributed). The struct<v,vt> boxing is applied
    * AFTER the distinct as a row-local projection, so the returned
    * frame is value-identical to [[runDocsBoxed]] and slots into the
    * same typed-restore bridge.
    *
    * Returns None — caller falls back to the boxed form — when native
    * equality can't provably reproduce the canonical-string join and
    * distinct semantics:
    *
    *  - a qvar fed by mixed integral+fractional sources (canonical
    *    strings join 5 with 5.0 exactly at any magnitude; a double
    *    coercion loses exactness past 2^53);
    *  - a qvar fed by two different non-integral types, BinaryType
    *    (string reinterpretation is lossy), or any other type whose
    *    value→canonical-string map isn't injective;
    *  - a qvar appearing in BOTH entity and value position (boxed
    *    joins require equal vt tags, so "ref" never matches "num"/
    *    "str" — the boxed result is empty there and the fallback
    *    preserves that).
    *
    * All-integral sets travel as long (Spark would widen the join key
    * the same way; the canonical strings agree). NaN and -0.0 agree by
    * construction: Spark normalizes both in join/group keys, and the
    * canonical encoding collapses -0.0 to "0" and maps NaN to "NaN" on
    * every source.
    */
  def runDocsNative(sources: Map[String, DocSource],
      patterns: Seq[Pattern],
      predicates: Seq[Map[String, Column] => Column] = Nil,
      keepDBid: Boolean = false,
      boxedPredicates: Seq[Map[String, Column] => Column] = Nil)
      : Option[DataFrame] = {
    import org.apache.spark.sql.types._
    require(patterns.nonEmpty, "query{} needs at least one pattern")
    if (!patterns.forall(_.a.isInstanceOf[C])) return None

    val entityVars = patterns.flatMap(_.e match {
      case V(n) => Some(n); case _ => None
    }).toSet
    val valueVars = patterns.flatMap(p => (p.a, p.v) match {
      case (C(_), V(n)) => Some(n); case _ => None
    }).toSet
    if (entityVars.intersect(valueVars).nonEmpty) return None

    // contributing native types per var
    val varTypes = scala.collection.mutable.Map.empty[String, Set[DataType]]
    patterns.foreach { p =>
      p.e match {
        case V(n) =>
          val src = sources(p.src)
          val f = src.df.schema(src.idCol)
          // Entity ids must reproduce the boxed form's plain
          // cast("string") + struct null-equality exactly: integral
          // and string ids do (the canonical print IS the plain cast,
          // and non-nullability rules out the null==null join the
          // boxed struct would keep but a native key would drop).
          // Fractional/date/timestamp ids would box via canonCol
          // ("5", not "5.0") — a silent divergence — so they fall
          // back to the boxed form.
          val idOk = (f.dataType match {
            case ByteType | ShortType | IntegerType | LongType => true
            case StringType => true
            case _ => false
          }) && !f.nullable
          if (!idOk) return None
          varTypes(n) = varTypes.getOrElse(n, Set.empty) + f.dataType
        case _ => ()
      }
      (p.a, p.v) match {
        case (C(attr), V(n)) =>
          sources(p.src).df.schema.find(_.name == attr.toString) match {
            case Some(f) =>
              varTypes(n) = varTypes.getOrElse(n, Set.empty) + f.dataType
            case None => return None
          }
        case _ => ()
      }
    }
    def integral(dt: DataType) = dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    // the native type each var travels as; None → ineligible
    val travel: Map[String, DataType] = varTypes.toMap.map {
      case (n, dts) =>
        val t: DataType =
          if (dts.forall(integral)) LongType
          else if (dts.size == 1) dts.head match {
            case t @ (StringType | BooleanType | DoubleType | FloatType |
                DateType | TimestampType) => t
            case t: DecimalType => t
            case _ => return None
          }
          else if (dts.forall(dt => integral(dt) ||
              dt.isInstanceOf[DecimalType])) {
            // integral+decimal mix (TPC-H money + key schemas): travels
            // as a widened decimal IF every decimal member shares one
            // scale — canonical strings are scale-sensitive ("5.50" vs
            // "5.5"), so mixed scales would join natively where the
            // boxed form does not. Precision covers every member's
            // integer digits plus a long's 19, so the widening cast is
            // exact (never rounds, never overflows) and canonCol on
            // the travel type prints integral values without the
            // fractional part — the boxed encoding on every source.
            val decs = dts.toSeq.collect { case d: DecimalType => d }
            val scales = decs.map(_.scale).toSet
            if (scales.size != 1 || scales.head < 0) return None
            val s = scales.head
            val intDigits = (decs.map(d => d.precision - d.scale) ++
              (if (dts.exists(integral)) Seq(19) else Nil)).max
            if (intDigits + s > 38) return None
            DecimalType(intDigits + s, s)
          }
          else return None
        n -> t
    }

    val grouped = groupPatterns(patterns)
    val frames = grouped.map { case (srcName, eTerm, pats) =>
      val src = sources(srcName)
      var f = src.df
      val cols = Seq.newBuilder[Column]
      // a var repeated WITHIN a group projects once; later
      // occurrences become native equality filters (the boxed form's
      // struct-equality mirror: equal values AND equal vt tags —
      // statically-unequal tags fold to false). Same-travel natives
      // compare exactly by the eligibility rules above.
      val seen = scala.collection.mutable.Map
        .empty[String, (Column, String)]
      eTerm match {
        case V(n) =>
          seen(n) = (col(src.idCol).cast(travel(n)), "ref")
          cols += col(src.idCol).cast(travel(n)).as(n)
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
            // same static vt gate as the boxed form (see there)
            val (v, vt) = canonConst(value)
            f = if (typeNameOf(dt) == vt)
              f.filter(canonCol(col(attr), dt) === v)
            else f.filter(lit(false))
          case V(n) =>
            f = f.filter(col(attr).isNotNull)
            val c = col(attr).cast(travel(n))
            val vt = typeNameOf(dt)
            seen.get(n) match {
              case Some((prev, pvt)) =>
                // travel eligibility forces ONE vt per var (entity∩value
                // vars rejected, numeric sets all-"num", other sets
                // singletons) — a mismatch here is an engine bug, not a
                // reachable query shape
                assert(pvt == vt,
                  s"repeated qvar $n: vt mismatch $pvt vs $vt")
                f = f.filter(prev === c)
              case None =>
                seen(n) = (c, vt)
                cols += c.as(n)
            }
          case W => f = f.filter(col(attr).isNotNull)
        }
      }
      f.select(cols.result(): _*)
    }.toSeq

    val joined = frames.reduceLeft { (acc, next) =>
      val shared = acc.columns.toSet.intersect(next.columns.toSet).toSeq
      if (shared.nonEmpty) acc.join(next, shared) else acc.crossJoin(next)
    }
    // predicates see the boxed view, synthesized inline from the
    // native columns (row-local; SimplifyExtractValueOps collapses the
    // struct wrap when a predicate only reads one field)
    def vtOf(n: String, dt: DataType) =
      if (entityVars.contains(n)) "ref" else typeNameOf(dt)
    val boundBoxed: Map[String, Column] = joined.columns.map { n =>
      val dt = joined.schema(n).dataType
      n -> struct(canonCol(joined(n), dt).as("v"),
        lit(vtOf(n, dt)).as("vt"))
    }.toMap
    val bound: Map[String, Column] =
      boundBoxed.map { case (n, s) => n -> s.getField("v") }
    val filtered = boxedPredicates.foldLeft(
      predicates.foldLeft(joined)((f, p) => f.filter(p(bound))))(
      (f, p) => f.filter(p(boundBoxed)))
    // Datalog set semantics over ALL found qvars — on NATIVE values —
    // THEN drop entity vars and box (row-local, post-shuffle)
    val distinctAll = filtered.distinct()
    val out = distinctAll.columns
      .filter(c => keepDBid || !entityVars.contains(c))
    Some(distinctAll.select(out.toSeq.map { c =>
      val dt = distinctAll.schema(c).dataType
      struct(canonCol(distinctAll(c), dt).as("v"),
        lit(vtOf(c, dt)).as("vt")).as(c)
    }: _*))
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

  /** Canonical string of a document column (must match Shred.canon).
    * try_cast: an out-of-long-range value must take the plain-string
    * branch (the generator form's semantics), not throw under ANSI.
    */
  private def canonCol(c: Column, dt: org.apache.spark.sql.types.DataType)
      : Column = {
    import org.apache.spark.sql.types._
    dt match {
      case DoubleType | FloatType | _: DecimalType =>
        when(c === c.try_cast(LongType).cast(dt),
            c.try_cast(LongType).cast("string"))
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
