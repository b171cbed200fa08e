package graft.lang

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.shred.Shred
import graft.query.QueryCompiler
import graft.query.QueryCompiler.{C, Pattern, V, W}
import graft.express.Express
import graft.express.Express._
import Ast._
import Compiler._

/** Text-surface query{}/express{} execution.
  *
  * Program-literal data reaches queries through a driver-side JSON
  * bridge (literal → JSON → `spark.read.json` → shred), and binding
  * sets come back typed the same way (boxed values → JSON rendering →
  * schema inference) — this restores value types exactly like the
  * reference's unboxing (`util.cljc:299-322` + `builtin.cljc:2041-2061`),
  * including non-string express keys. Literal programs are small by
  * construction; the Scala API (QueryCompiler/Express over real
  * DataFrames) remains the 100 TB path.
  */
object QueryBridge {

  /** Program-literal value → DataFrame (rows = array elements).
    *
    * The carrier is a one-row LOCAL relation, and the array case
    * renders per-element JSON with a `transform` HOF instead of an
    * explode: Project-over-LocalRelation constant-folds
    * (ConvertToLocalRelation), so the literal→JSON rendering collects
    * driver-locally with NO Spark job — the old `spark.range(1)` +
    * explode carrier paid one cluster job per literal (round-18
    * q_rm_mixed job attribution). The read.json schema-inference pass
    * stays (it defines the bridge's type normalization).
    */
  def cdToDf(spark: SparkSession, d: CD): DataFrame = {
    import spark.implicits._
    val carrier = Seq(0).toDF("__c")
    val json: Seq[String] = d.kind match {
      case KScalar =>
        carrier.select(to_json(d.col)).as[String].collect().toSeq
      case _ =>
        carrier.select(transform(d.col, x => to_json(x)).as("j"))
          .as[Seq[String]].collect().toSeq.flatten
    }
    spark.read.json(json.toDS())
  }

  /** Run a query def against positional data arguments. Literal
    * program data goes through the JSON bridge with typed restore
    * (driver-side, small by construction); DataFrame arguments (bound
    * via RM.evalWithSources) stay fully distributed — binding values
    * then use the canonical string encoding.
    */
  def runQuery(spark: SparkSession, q: QueryDef,
      paramSubst: Map[String, Any], dataArgs: Seq[CV]): CTab = {
    val allTables = dataArgs.forall(_.isInstanceOf[CTab])
    val dfs = dataArgs.map {
      case CTab(df) => df
      case d: CD => cdToDf(spark, d)
      case _ => Compiler.fail("query data argument must be a value")
    }
    // positional source naming: patterns with explicit $DB names bind
    // in order of first appearance; unnamed patterns use the first arg
    val named = q.patterns.flatMap(_.src).distinct
    val srcDfs: Map[String, DataFrame] =
      (if (named.isEmpty) Map.empty[String, DataFrame]
       else named.zip(dfs).toMap) ++ Map("default" -> dfs.head)
    val pats = q.patterns.map { p =>
      val v = p.v match {
        case QvarRef(n) => V(n)
        case StrLit(s) => C(s)
        case NumLit(n) => C(n)
        case BoolLit(b) => C(b)
        case VarRef(n) => paramSubst.get(n) match {
          case Some(value) => C(value)
          case None => Compiler.fail(s"unbound query parameter $$$n")
        }
        case other => Compiler.fail(s"pattern value $other")
      }
      Pattern(V(p.e),
        p.attr.fold(role => C(role), qv => V(qv)),
        v, p.src.getOrElse("default"))
    }
    // predicate patterns: [($match(?str, /re/))] — compile with qvars
    // restored to NATIVE types (the reference binds Datahike's typed
    // values, so `[(?n = 5)]` matches a numeric ?n without $number).
    // Direct-path static hints type the column exactly; without a
    // provable type the boxed (v, vt) pair restores per row through
    // the variant channel, whose `=`/comparisons/arithmetic already
    // carry reference semantics (type-strict, numeric across
    // encodings).
    def predFns(hints: Map[String, Set[org.apache.spark.sql.types
        .DataType]]) = q.preds.map { p =>
      (bound: Map[String, org.apache.spark.sql.Column]) =>
        graft.functions.Jsonata.boolean(
          materialize(Compiler.compile(p, typedPredEnv(bound, hints))).col)
    }
    // the reference parses arbitrary <|k: v|> maps but EXECUTES only
    // keepDBid (builtin.cljc:1753 is the sole consumer) — anything
    // else must error loudly here: silently ignoring an option the
    // user wrote is worse than rejecting it
    val unknownOpts = q.options.keySet - "keepDBid"
    if (unknownOpts.nonEmpty)
      Compiler.fail(s"unknown query option(s): " +
        s"${unknownOpts.toSeq.sorted.mkString(", ")} (supported: keepDBid)")
    val keepDBid = q.options.get("keepDBid").contains("true")

    // Direct (EAV-free) routing: when every pattern names a constant
    // attribute the resolver can compile over the documents — top-level
    // atomic columns AND struct-ref chains since round 16 — skip the
    // shred entirely (one narrow projection per entity var, no triple
    // self-joins — QueryCompiler.runDocs). Array attributes, wildcard
    // attrs, and unresolvable shapes fall back to the EAV form, whose
    // explode materializes sub-entities.
    // a `$db` result (triple frame) routes straight to the EAV
    // engine: it IS the database, so the direct path (which reads
    // data columns) and the shred (which would shred triples of
    // triples) must both be skipped
    val anyDb = srcDfs.values.exists(Shred.isTriplesFrame)
    // entity ids travel as 8-byte longs (the native path's join/
    // distinct key); the boxed projection casts to the identical
    // string, so every downstream contract is unchanged. The content
    // hash covers the whole row, so it is row-FUNCTIONAL: same-entity
    // patterns may fuse into one row-local projection (equal ids imply
    // equal rows — zip == per-entity product)
    val docs = srcDfs.map { case (n, df) =>
      n -> QueryCompiler.DocSource(df.withColumn(EntCol,
        Shred.derivedIdLong(df)), EntCol, idFunctional = true)
    }
    lazy val hints = QueryCompiler.docVarTypes(docs, pats)
    // native-typed route first (joins + the Datalog distinct carry
    // source-typed values, not canonical-string structs — the
    // fact-scale profile); boxed when a qvar's types can't provably
    // preserve canonical semantics natively; EAV when unresolvable
    val direct = if (anyDb) None else
      QueryCompiler.runDocsNative(docs, pats, Nil, keepDBid,
          boxedPredicates = predFns(hints))
        .orElse(QueryCompiler.runDocsBoxedOpt(docs, pats, Nil, keepDBid,
          boxedPredicates = predFns(hints)))
    direct match {
      case Some(boxed) =>
        if (allTables) // canonical string bindings, like QueryCompiler.run
          CTab(boxed.select(boxed.columns.toSeq
            .map(c => boxed(c).getField("v").as(c)): _*))
        else
          CTab(typedBsets(spark, boxed, hints))
      case None =>
        compileEav(spark, srcDfs, pats, keepDBid, predFns, allTables)
    }
  }

  private def compileEav(spark: org.apache.spark.sql.SparkSession,
      srcDfs: Map[String, org.apache.spark.sql.DataFrame],
      pats: Seq[QueryCompiler.Pattern], keepDBid: Boolean,
      predFns: Map[String, Set[org.apache.spark.sql.types.DataType]] =>
        Seq[Map[String, org.apache.spark.sql.Column] =>
          org.apache.spark.sql.Column],
      allTables: Boolean): CTab = {
    {
      val sources = srcDfs.map { case (n, df) =>
        n -> (if (Shred.isTriplesFrame(df)) df else Shred.shred(df)) }
      if (allTables) // distributed end-to-end; canonical string bindings
        CTab(QueryCompiler.run(sources, pats, Nil, keepDBid,
          boxedPredicates = predFns(Map.empty)))
      else
        CTab(typedBsets(spark,
          QueryCompiler.runBoxed(sources, pats, Nil, keepDBid,
            boxedPredicates = predFns(Map.empty))))
    }
  }

  /** Native-typed predicate environment from the boxed binding columns:
    * all-integral hints restore longs, all-numeric doubles, all-boolean
    * booleans, any all-non-numeric atomic set the canonical string
    * (strings, refs, dates); mixed or unknown kinds restore per-row as
    * variants (Compiler.variantOfBoxed).
    */
  private def typedPredEnv(bound: Map[String, org.apache.spark.sql.Column],
      hints: Map[String, Set[org.apache.spark.sql.types.DataType]]): Env = {
    import org.apache.spark.sql.types._
    bound.map { case (n, s) =>
      val v = s.getField("v")
      val cd = hints.get(n) match {
        case Some(dts) if dts.nonEmpty && dts.forall {
            case ByteType | ShortType | IntegerType | LongType => true
            case _ => false
          } => CD(v.cast(LongType), LongType, KScalar)
        case Some(dts) if dts.nonEmpty &&
            dts.forall(_.isInstanceOf[NumericType]) =>
          CD(v.cast(DoubleType), DoubleType, KScalar)
        case Some(dts) if dts.nonEmpty && dts.forall(_ == BooleanType) =>
          CD(v.cast(BooleanType), BooleanType, KScalar)
        case Some(dts) if dts.nonEmpty && dts.forall(dt =>
            !dt.isInstanceOf[NumericType] && dt != BooleanType) =>
          CD(v, StringType, KScalar)
        case _ => CD(Compiler.variantOfBoxed(s),
          org.apache.spark.sql.types.VariantType, KScalar)
      }
      ("?" + n) -> (cd: CV)
    }
  }

  private val EntCol = "__graft_e"

  /** Direct-path eligibility: constant attrs only, each resolving to an
    * atomic top-level column of its source frame. A missing attribute
    * means "no such triples" — the EAV path yields the correct empty
    * result, so it is routed there rather than special-cased here.
    */
  /** Boxed (v, vt) binding frame → typed frame, fully distributed.
    *
    * The result schema needs one runtime fact per column — the set of
    * value-kind tags (and, for numbers, whether every value is
    * integral). That is ONE tiny aggregate job (map-side partial
    * `collect_set` over ≤4 tags per column); the binding data itself is
    * never collected, so a query mixing a literal lookup list with a
    * full-size table stays distributed end-to-end. Typing then is a
    * per-column `cast` in the plan — same result as the previous
    * JSON-render-and-infer bridge (num → long when all integral else
    * double, bool → boolean, str/ref pass through, all-null columns
    * dropped), minus the driver materialization.
    */
  private def typedBsets(spark: SparkSession, boxed: DataFrame,
      hints: Map[String, Set[org.apache.spark.sql.types.DataType]] =
        Map.empty): DataFrame = {
    import org.apache.spark.sql.types._
    val cols = boxed.columns
    if (cols.isEmpty) return boxed

    // Columns with provable static types (direct doc path) skip the
    // runtime type-facts job entirely: integral numerics are long,
    // booleans boolean, strings/refs/mixed pass through. Fractional
    // numerics still need the runtime all-integral check to match the
    // reference's unboxing (an all-integral number column restores as
    // integers — util.cljc:299-322).
    sealed trait Plan
    case object AsLong extends Plan
    case object AsBool extends Plan
    case object AsStr extends Plan
    case object Runtime extends Plan
    val plans: Map[String, Plan] = cols.map { c =>
      c -> (hints.get(c) match {
        case Some(dts) if dts.nonEmpty =>
          if (dts.forall(dt => dt match {
            case ByteType | ShortType | IntegerType | LongType => true
            case _ => false
          })) AsLong
          else if (dts.forall(_ == BooleanType)) AsBool
          // any all-numeric hint set (all-fractional OR mixed
          // integral+fractional) defers to the runtime all-integral
          // check, matching the EAV path's unboxing (an all-integral
          // number column restores as longs — util.cljc:299-322);
          // only genuinely mixed KINDS (string/ref/bool with num)
          // take the canonical-string form
          else if (dts.forall(_.isInstanceOf[NumericType])) Runtime
          else AsStr // strings, refs, or statically mixed kinds
        case _ => Runtime // no static info: full runtime facts
      })
    }.toMap

    val runtimeCols = cols.filter(plans(_) == Runtime)
    val facts: Option[org.apache.spark.sql.Row] =
      if (runtimeCols.isEmpty) None
      else {
        // the facts aggregate and the returned select both consume the
        // joined frame — stage (persist + register) so the join runs
        // once (spillable storage; binding frames are join outputs,
        // typically far smaller than their inputs). Unpersisting after
        // the facts head() would force the final select to recompute
        // the join — exactly the double-run this cache prevents — so
        // the blocks live until the harness's Caches.releaseAll
        graft.core.Caches.stage(boxed)
        val aggs = runtimeCols.flatMap { c =>
          Seq(
            collect_set(col(c).getField("vt")).as(s"${c}__vt"),
            min(when(col(c).getField("vt") === "num",
              col(c).getField("v").rlike("^-?\\d+$").cast("int")))
              .as(s"${c}__int"))
        }
        Some(boxed.agg(aggs.head, aggs.tail: _*).head())
      }
    val out = cols.flatMap { c =>
      val v = col(c).getField("v")
      plans(c) match {
        case AsLong => Some(v.cast("long").as(c))
        case AsBool => Some(v.cast("boolean").as(c))
        case AsStr => Some(v.as(c))
        case Runtime =>
          val f = facts.get
          val vts = f.getAs[scala.collection.Seq[String]](s"${c}__vt").toSet
          if (vts.isEmpty) None // all-null column: same as the JSON bridge
          else {
            val typed =
              if (vts == Set("num"))
                if (f.getAs[Int](s"${c}__int") == 1) v.cast("long")
                else v.cast("double")
              else if (vts == Set("bool")) v.cast("boolean")
              else v
            Some(typed.as(c))
          }
      }
    }
    if (out.isEmpty) spark.emptyDataFrame else boxed.select(out.toSeq: _*)
  }

  /** Any query/express data value as a DataFrame (tables pass through,
    * program literals go through the JSON bridge).
    */
  def dataFrameOf(spark: SparkSession, cv: CV): DataFrame = cv match {
    case CTab(df) => df
    case d: CD => cdToDf(spark, d)
    case _ => Compiler.fail("$qIdent/$eIdent argument must be a value")
  }

  /** The shape `$qIdent`/`$eIdent` derive from: struct-typed program
    * literals give their schema directly (preserving the literal's
    * field order, which fixes qvar numbering); tables their schema;
    * anything else goes through the JSON bridge.
    */
  def identSchemaOf(spark: SparkSession, cv: CV)
      : org.apache.spark.sql.types.StructType = cv match {
    case CTab(df) => df.schema
    case CD(_, st: org.apache.spark.sql.types.StructType, _) => st
    case cd: CD => dataFrameOf(spark, cd).schema
    case _ => Compiler.fail("$qIdent/$eIdent argument must be a value")
  }

  /** `$qIdent`/`$eIdent` (builtin.cljc:2264-2311): the identity query
    * patterns and express template for a shape, with the reference's
    * positional naming — entities ?e1..?eN, scalars ?v1..?vN, both
    * counters advancing in one depth-first field walk (the generated
    * forms in query_test.cljc:1066-1076). The two derivations share the
    * walk so the query's qvars line up with the template's.
    */
  def identPair(schema: org.apache.spark.sql.types.StructType)
      : (Seq[QPattern], XObj) = {
    import org.apache.spark.sql.types._
    var eN = 1
    var vN = 0
    val pats = Seq.newBuilder[QPattern]
    def walk(entity: String, st: StructType): XObj =
      XObj(st.fields.toSeq.map { f =>
        f.dataType match {
          case sub: StructType =>
            eN += 1; val subE = s"e$eN"
            pats += QPattern(None, entity, Left(f.name), QvarRef(subE))
            XField(KLit(f.name), walk(subE, sub))
          case ArrayType(sub: StructType, _) =>
            eN += 1; val subE = s"e$eN"
            pats += QPattern(None, entity, Left(f.name), QvarRef(subE))
            XField(KLit(f.name), XArr(walk(subE, sub)))
          case ArrayType(_, _) =>
            vN += 1; val v = s"v$vN"
            pats += QPattern(None, entity, Left(f.name), QvarRef(v))
            XField(KLit(f.name), XArrVal(v))
          case _ =>
            vN += 1; val v = s"v$vN"
            pats += QPattern(None, entity, Left(f.name), QvarRef(v))
            XField(KKey(f.name, v), XLit(null))
        }
      })
    val tmpl = walk("e1", schema)
    (pats.result(), tmpl)
  }

  /** express{} template AST → Express.XObj; `subst` carries bound
    * `$param` literals (`express-sub`, builtin.cljc:1930-1938).
    */
  def templateOf(e: Expr, subst: Map[String, Any] = Map.empty): XObj =
    e match {
      case ObjLit(pairs) =>
        XObj(pairs.map {
          case (QvarRef(q), v) => XField(KVar(q), valueOf(v, subst))
          case (StrLit(k), Apply(Ident("key"), Seq(QvarRef(q)))) =>
            XField(KKey(k, q), XLit(null))
          case (StrLit(k), v) => XField(KLit(k), valueOf(v, subst))
          case (k, _) => Compiler.fail(s"express key $k")
        })
      case other =>
        Compiler.fail(s"express template must be an object: $other")
    }

  private def valueOf(e: Expr, subst: Map[String, Any]): XValue = e match {
    case QvarRef(q) => XVar(q)
    case StrLit(s) => XLit(s)
    case NumLit(n) => XLit(n)
    case BoolLit(b) => XLit(b)
    case VarRef(n) => subst.get(n) match {
      case Some(v) => XLit(v)
      case None => Compiler.fail(s"unbound express parameter $$$n")
    }
    case o: ObjLit => templateOf(o, subst)
    case ArrLit(Seq(o: ObjLit)) => XArr(templateOf(o, subst))
    case ArrLit(Seq(QvarRef(q))) => XArrVal(q)
    case other => Compiler.fail(s"express template value: $other")
  }

  /** $reduce(bsets, express) → merged document(s). */
  def reduce(spark: SparkSession, bsets: CV, tmpl: XObj): CV = {
    val df = bsetsDf(spark, bsets)
    CTab(Express.reduceBsets(df, tmpl))
  }

  /** $map(bsets, express) → one document per binding set. */
  def mapEx(spark: SparkSession, bsets: CV, tmpl: XObj): CV = {
    val df = bsetsDf(spark, bsets)
    CTab(Express.mapBsets(df, tmpl))
  }

  private def bsetsDf(spark: SparkSession, bsets: CV): DataFrame =
    bsets match {
      case CTab(df) => df
      case d: CD => cdToDf(spark, d) // hand-written bset literals
      case _ => Compiler.fail("$reduce/$map: first argument must be " +
        "binding sets")
    }
}
