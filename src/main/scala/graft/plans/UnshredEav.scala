package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

import graft.shred.ShredGenerator

/** EAV "unshredding" (SURVEY §4 item 7): collapse a triple-pattern
  * filter over a shredded document frame back into a narrow projection
  * over the documents themselves.
  *
  * The `query{}` compiler filters the shred output once per pattern
  * (`a === "attr"`), so a k-pattern query plans k full
  * `Generate(ShredGenerator)` passes over the document frame — each
  * one explodes EVERY attribute of every row only to keep one. When
  * the attribute is a constant, the kept triples are a pure function
  * of one (possibly nested) column, so the whole explode collapses to
  *
  * {{{
  *   Filter(a === "city", Generate(ShredGenerator(e, row), docs))
  *     ⇒ Project(e', "city", canon(col), vt, vn,
  *               Filter(col isNotNull && e isNotNull, docs))
  * }}}
  *
  * which Catalyst then pushes into the scan: ReadSchema shrinks to the
  * referenced column and the IsNotNull reaches PushedFilters. This is
  * the rule form of `QueryCompiler.runDocs` — but it also covers the
  * shapes runDocs refuses: attributes nested under ref-typed struct
  * attrs (the sub-entity chain `[?e :addr ?a][?a :city ?c]` keeps its
  * join, but each side becomes a narrow scan), and frames the user
  * shredded explicitly.
  *
  * Soundness rules (any miss ⇒ the plan is left alone):
  *  - the filter must pin `a` to a string literal; remaining conjuncts
  *    stay in a Filter above the rewrite;
  *  - every schema site of the attribute must be reconstructible: a
  *    top-level or struct-nested field of string/numeric/boolean type,
  *    or a struct (ref triple). Sites at or under arrays keep the
  *    generator (element-indexed entity ids need the explode), and so
  *    do types whose generator canon is not `cast(string)`
  *    (date/timestamp/binary);
  *  - the entity-id and row expressions must be deterministic (they
  *    get duplicated per site);
  *  - the Generate must not also forward child columns.
  *
  * Multiple sites of one attribute union their projections (first
  * branch keeps the generator's exprIds, so parent references bind
  * unchanged); an attribute provably absent from the schema rewrites
  * to an empty relation.
  *
  * Controlled by `spark.graft.unshred.enabled` (default true).
  */
object UnshredEav extends Rule[LogicalPlan] with PredicateHelper {

  val FLAG = "spark.graft.unshred.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(FLAG, "true") != "true") return plan
    plan.transformUp {
      case f @ Filter(cond, g: Generate)
          if g.generator.isInstanceOf[ShredGenerator] &&
            !g.outer && g.requiredChildOutput.isEmpty =>
        rewrite(f, cond, g).getOrElse(f)
    }
  }

  /** One reconstructible schema occurrence of the attribute. */
  private final case class Site(
      parents: Seq[String],   // enclosing struct-field names, outermost first
      expr: Expression,       // the field itself (null-propagating chain)
      isRef: Boolean)

  private def rewrite(f: Filter, cond: Expression, g: Generate)
      : Option[LogicalPlan] = {
    val gen = g.generator.asInstanceOf[ShredGenerator]
    val outs = g.generatorOutput
    if (outs.size != 5) return None
    val outA = outs(1)

    // split off `a === "name"`; everything else stays above the rewrite
    def aLiteral(e: Expression): Option[String] = e match {
      case EqualTo(a: Attribute, Literal(s, StringType))
          if a.exprId == outA.exprId && s != null => Some(s.toString)
      case EqualTo(Literal(s, StringType), a: Attribute)
          if a.exprId == outA.exprId && s != null => Some(s.toString)
      case _ => None
    }
    val conjuncts = splitConjunctivePredicates(cond)
    val (aEq, rest) = conjuncts.partition(aLiteral(_).isDefined)
    // EXACTLY one pinned attribute: two different `a === lit`
    // conjuncts (CombineFilters merges stacked filters before this
    // rule runs) contradict each other — taking the first would turn
    // an always-empty result into wrong rows, so bail and let the
    // generator path produce the correct empty frame
    val aNames = aEq.flatMap(aLiteral).distinct
    if (aNames.size != 1) return None
    val attrName = aNames.head

    // generator child must be the analyzed struct(e, row) build
    def strip(e: Expression): Expression = e match {
      case a: Alias => strip(a.child)
      case e => e
    }
    val (eExpr, rowEntries) = strip(gen.child) match {
      case cns: CreateNamedStruct if cns.valExprs.size == 2 =>
        strip(cns.valExprs(1)) match {
          case row: CreateNamedStruct =>
            val names = row.nameExprs.map {
              case Literal(s, StringType) if s != null => s.toString
              case _ => return None
            }
            (strip(cns.valExprs.head), names.zip(row.valExprs.map(strip)))
          case _ => return None
        }
      case _ => return None
    }
    if (!eExpr.deterministic || rowEntries.exists(!_._2.deterministic))
      return None

    val found = sites(attrName, Nil, rowEntries).getOrElse(return None)

    val replacement =
      if (found.isEmpty) LocalRelation(f.output)
      else {
        val branches = found.zipWithIndex.map { case (site, i) =>
          branch(site, attrName, eExpr, g, reuseIds = i == 0, outs)
        }
        if (branches.size == 1) branches.head else Union(branches)
      }
    val restored =
      if (found.isEmpty || rest.isEmpty) replacement
      else Filter(rest.reduce(And), replacement)
    Some(restored)
  }

  /** All sites of `name`, or None when any occurrence (or potential
    * occurrence under an array) is not reconstructible.
    */
  private def sites(name: String, parents: Seq[String],
      entries: Seq[(String, Expression)]): Option[Seq[Site]] = {
    val out = Seq.newBuilder[Site]
    entries.foreach { case (fname, fexpr) =>
      fexpr.dataType match {
        case st: StructType =>
          if (fname == name) out += Site(parents, fexpr, isRef = true)
          val sub = st.fields.zipWithIndex.map { case (sf, i) =>
            sf.name -> (GetStructField(fexpr, i, Some(sf.name)): Expression)
          }
          out ++= sites(name, parents :+ fname, sub.toSeq).getOrElse(return None)
        case at: ArrayType =>
          // element-indexed ids need the generator; bail if the
          // attribute is (or could hide) here
          if (fname == name || containsField(at.elementType, name))
            return None
        case dt =>
          if (fname == name) {
            if (!supportedScalar(dt)) return None
            out += Site(parents, fexpr, isRef = false)
          }
      }
    }
    Some(out.result())
  }

  private def containsField(dt: DataType, name: String): Boolean = dt match {
    case st: StructType =>
      st.fields.exists(f => f.name == name || containsField(f.dataType, name))
    case ArrayType(et, _) => containsField(et, name)
    case MapType(k, v, _) => containsField(k, name) || containsField(v, name)
    case _ => false
  }

  /** Types whose ShredGenerator canon equals the expression-form canon
    * (`Shred.canon`). Date/timestamp/binary render their *internal*
    * value in the generator, which no Cast reproduces — keep those on
    * the generator path.
    */
  private def supportedScalar(dt: DataType): Boolean = dt match {
    case StringType | BooleanType => true
    case _: NumericType => true
    case _ => false
  }

  /** One site's triples as a projection over the Generate's child. */
  private def branch(site: Site, name: String, eExpr: Expression,
      g: Generate, reuseIds: Boolean, outs: Seq[Attribute]): LogicalPlan = {
    val str = StringType
    val entity: Expression =
      if (site.parents.isEmpty) eExpr
      else Concat(Seq(eExpr, Literal("/" + site.parents.mkString("/"))))
    val (v, vt, vn): (Expression, Expression, Expression) =
      if (site.isRef)
        (Concat(Seq(entity, Literal("/" + name))), Literal("ref"),
          Literal(null, DoubleType))
      else {
        val dt = site.expr.dataType
        val canonV = dt match {
          case DoubleType | FloatType | _: DecimalType =>
            val asLong = Cast(site.expr, LongType)
            CaseWhen(
              Seq((EqualTo(site.expr, Cast(asLong, dt)),
                Cast(asLong, str))),
              Cast(site.expr, str))
          case _ => Cast(site.expr, str)
        }
        val vtName = dt match {
          case _: NumericType => "num"
          case BooleanType => "bool"
          case _ => "str"
        }
        val vnExpr: Expression = dt match {
          case _: NumericType => Cast(site.expr, DoubleType)
          case _ => Literal(null, DoubleType)
        }
        (canonV, Literal(vtName), vnExpr)
      }
    // emit iff the generator would have walked here: the field chain
    // null-propagates ancestors, and a null entity id emits nothing
    val keep = And(IsNotNull(site.expr), IsNotNull(eExpr))
    val values = Seq(entity, Literal(name), v, vt, vn)
    val aliases = outs.zip(values).map { case (out, value) =>
      if (reuseIds) Alias(value, out.name)(exprId = out.exprId)
      else Alias(value, out.name)()
    }
    Project(aliases, Filter(keep, g.child))
  }

  /** Idempotently register on a session (experimental batch). */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(this))
      spark.experimental.extraOptimizations = cur :+ this
  }
}
