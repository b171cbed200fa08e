package graft.shred

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._
import graft.query.QueryCompiler
import graft.query.QueryCompiler.{C, Pattern, V}
import graft.express.Express
import graft.express.Express._

/** `$qIdent` / `$eIdent` / `$identities` (reference
  * `builtin.cljc:2264-2311`; round-trip tests `query_test.cljc:1117-1132`):
  * derive the *identity* query (binds every attribute of a shape to a
  * qvar) and the matching express template (rebuilds the shape from
  * those binding sets) from a schema.
  *
  * Since binding values use the EAV canonical string encoding (Shred),
  * the round-tripped document carries canonical strings — the boxing
  * the reference applies (`util.cljc:299-322`) has the same effect in
  * its scratch DB; its type-restore pass maps onto an optional
  * downstream cast by the caller.
  */
object Identities {

  /** Qvar name for a field path. */
  private def qv(prefix: String, name: String): String =
    if (prefix.isEmpty) name else s"${prefix}__$name"

  /** The identity query: one pattern per attribute, nested structs and
    * arrays-of-structs get their own entity vars joined through ref
    * triples.
    */
  def qIdent(schema: StructType, src: String = "default",
      entity: String = "e", prefix: String = ""): Seq[Pattern] =
    schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case st: StructType =>
          val subEnt = s"${entity}_${f.name}"
          Pattern(V(entity), C(f.name), V(subEnt), src) +:
            qIdent(st, src, subEnt, qv(prefix, f.name))
        case ArrayType(st: StructType, _) =>
          val subEnt = s"${entity}_${f.name}"
          Pattern(V(entity), C(f.name), V(subEnt), src) +:
            qIdent(st, src, subEnt, qv(prefix, f.name))
        case _ =>
          Seq(Pattern(V(entity), C(f.name), V(qv(prefix, f.name)), src))
      }
    }

  /** The identity express template: every scalar is a key (so reduce
    * reconstructs exactly the distinct entities), nested shapes rebuild
    * as objects / arrays-of-objects / scalar arrays.
    */
  def eIdent(schema: StructType, prefix: String = ""): XObj =
    XObj(schema.fields.toSeq.map { f =>
      f.dataType match {
        case st: StructType =>
          XField(KLit(f.name), eIdent(st, qv(prefix, f.name)))
        case ArrayType(st: StructType, _) =>
          XField(KLit(f.name), XArr(eIdent(st, qv(prefix, f.name))))
        case ArrayType(_, _) =>
          XField(KLit(f.name), XArrVal(qv(prefix, f.name)))
        case _ =>
          XField(KKey(f.name, qv(prefix, f.name)), XLit(null))
      }
    })

  /** `$identities` — the (query, express) pair for a shape. */
  def identities(schema: StructType)
      : (Seq[Pattern], XObj) = (qIdent(schema), eIdent(schema))

  /** Text rendering of the identity query, reference-numbered
    * (`builtin.cljc:2264-2283`): entities ?e1, ?e2, … minted
    * depth-first as nested STRUCTS are entered; every other field —
    * scalars AND arrays, exactly the reference's `map?`-only
    * recursion — binds a ?vN value var. The string is a runnable
    * `query{}` body.
    */
  def qIdentText(schema: StructType): String = {
    var ecnt = 0
    var vcnt = 0
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    def qi(s: StructType): Unit = {
      ecnt += 1
      val ename = s"?e$ecnt"
      s.fields.foreach { f =>
        f.dataType match {
          case st: StructType =>
            out += s"[$ename :${f.name} ?e${ecnt + 1}]"
            qi(st)
          case _ =>
            vcnt += 1
            out += s"[$ename :${f.name} ?v$vcnt]"
        }
      }
    }
    qi(schema)
    out.mkString(" ")
  }

  /** Text rendering of the identity express template, value vars
    * numbered by the same traversal as [[qIdentText]] (reference
    * `builtin.cljc:2290-2303`). The string is a runnable `express{}`
    * body.
    */
  def eIdentText(schema: StructType): String = {
    var vcnt = 0
    def ei(s: StructType): String =
      s.fields.map { f =>
        f.dataType match {
          case st: StructType => s"'${f.name}': ${ei(st)}"
          case _ =>
            vcnt += 1
            s"'${f.name}': ?v$vcnt"
        }
      }.mkString("{", ", ", "}")
    ei(schema)
  }

  /** `$identities` at the TEXT surface (reference
    * `builtin.cljc:2305-2311`: "values are strings of corresponding
    * query"): {'query': …, 'express': …} with runnable body strings.
    */
  def identitiesText(schema: StructType): (String, String) =
    (qIdentText(schema), eIdentText(schema))

  /** Full identity round trip: shred → identity query → identity
    * express reduce. Returns the reconstructed entity frame (canonical
    * string leaves).
    */
  def roundTrip(df: DataFrame, idCol: Option[String] = None): DataFrame = {
    val triples = Shred.shred(df, idCol)
    val bsets = QueryCompiler.run(triples, qIdent(df.schema))
    Express.reduceBsets(bsets, eIdent(df.schema))
  }
}
