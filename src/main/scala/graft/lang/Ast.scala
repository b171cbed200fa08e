package graft.lang

/** AST for the RADmapper/JSONata expression language (SURVEY.md §3.1;
  * reference parse.cljc produces the equivalent `:typ` maps).
  */
object Ast {
  sealed trait Expr

  final case class NumLit(v: Double) extends Expr
  final case class StrLit(v: String) extends Expr
  final case class BoolLit(v: Boolean) extends Expr
  case object NullLit extends Expr
  final case class RegexLit(pattern: String) extends Expr
  final case class ArrLit(items: Seq[Expr]) extends Expr
  final case class ObjLit(pairs: Seq[(Expr, Expr)]) extends Expr

  /** bare field name inside a path */
  final case class Ident(name: String) extends Expr
  /** `$x`; name "" is the context `$`, "$" the root `$$` */
  final case class VarRef(name: String) extends Expr

  final case class BinOp(op: String, l: Expr, r: Expr) extends Expr
  final case class Neg(e: Expr) extends Expr
  final case class Not(e: Expr) extends Expr
  final case class Ternary(cond: Expr, t: Expr, f: Expr) extends Expr

  /** `src . step` — step is Ident, VarRef(""), Parens (map-step),
    * ArrLit (value-step), or FnCall applied per element.
    */
  final case class PathStep(src: Expr, step: Expr) extends Expr
  /** `src [pred]` — numeric pred = index, else filter */
  final case class Filter(src: Expr, pred: Expr) extends Expr
  /** parenthesized expression used as a path step */
  final case class Parens(body: Expr) extends Expr
  /** `src{k: v, ...}` / `src.{k: v, ...}` — reduce (grouping) step:
    * group elements by key expr, value expr runs once per group with
    * `$` = the group sequence (reference parse.cljc:834-839).
    */
  final case class ReduceExp(pairs: Seq[(Expr, Expr)]) extends Expr

  final case class FnCall(name: String, args: Seq[Expr]) extends Expr

  /** `?name` — query variable (query/express/bset contexts) */
  final case class QvarRef(name: String) extends Expr
  /** one `[<$src>? ?e :attr v]` triple pattern; attr Left=role,
    * Right=qvar; v is QvarRef / literal / VarRef (parameter)
    */
  final case class QPattern(src: Option[String], e: String,
    attr: Either[String, String], v: Expr)
  /** `query($params, <|opts|>){patterns [predicates]}`; `identArg` set
    * means the body was `$qIdent(arg)` — patterns derive from the
    * argument's shape at compile time (builtin.cljc:2264-2311)
    */
  final case class QueryDef(params: Seq[String],
    patterns: Seq[QPattern], preds: Seq[Expr] = Nil,
    options: Map[String, String] = Map.empty,
    identArg: Option[Expr] = None) extends Expr
  /** `express($params){ {template} }`. The reference grammar also
    * admits an `<|options|>` map here (parse.cljc:1146-1166) but
    * consults none of its keys (rewrite.cljc:195 stores them, nothing
    * reads them) — we parse it for grammar parity and reject non-empty
    * maps at compile time. */
  final case class ExpressDef(params: Seq[String],
    template: Expr, options: Map[String, String] = Map.empty)
    extends Expr
  final case class Lambda(params: Seq[String], body: Expr) extends Expr
  final case class Apply(fn: Expr, args: Seq[Expr]) extends Expr
  final case class Block(bindings: Seq[(String, Expr)], result: Expr)
    extends Expr
}
