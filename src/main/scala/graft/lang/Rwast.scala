package graft.lang

import Ast._

/** Canonical "exchange form" AST serialization (reference
  * `rwast.cljc` — feature 6 in SURVEY.md: an interoperable,
  * implementation-neutral rendering of parsed programs). JSON with a
  * `typ` tag per node, stable field order.
  */
object Rwast {

  def toExchange(src: String): String = render(Parser.parse(src))

  def render(e: Expr): String = e match {
    case NumLit(v) =>
      val n = if (v.isWhole && math.abs(v) < 1e15) v.toLong.toString
        else v.toString
      obj("typ" -> q("Num"), "val" -> n)
    case StrLit(v) => obj("typ" -> q("Str"), "val" -> q(v))
    case BoolLit(v) => obj("typ" -> q("Bool"), "val" -> v.toString)
    case NullLit => obj("typ" -> q("Null"))
    case RegexLit(p) => obj("typ" -> q("Regex"), "pattern" -> q(p))
    case ArrLit(items) =>
      obj("typ" -> q("Array"), "items" -> arr(items.map(render)))
    case ObjLit(pairs) =>
      obj("typ" -> q("Obj"), "pairs" -> arr(pairs.map { case (k, v) =>
        obj("key" -> render(k), "val" -> render(v))
      }))
    case ReduceExp(pairs) =>
      // reference rwast keeps ReduceExp distinct from ObjExp even
      // though the surface syntax is shared (parse.cljc:822-840)
      obj("typ" -> q("ReduceExp"), "pairs" -> arr(pairs.map { case (k, v) =>
        obj("key" -> render(k), "val" -> render(v))
      }))
    case Ident(n) => obj("typ" -> q("Field"), "name" -> q(n))
    case VarRef(n) => obj("typ" -> q("Var"), "name" -> q(n))
    case QvarRef(n) => obj("typ" -> q("Qvar"), "name" -> q(n))
    case BinOp(op, l, r) =>
      obj("typ" -> q("BinOp"), "op" -> q(op),
        "lhs" -> render(l), "rhs" -> render(r))
    case Neg(x) => obj("typ" -> q("Neg"), "arg" -> render(x))
    case Not(x) => obj("typ" -> q("Not"), "arg" -> render(x))
    case Ternary(c, t, f) =>
      obj("typ" -> q("Conditional"), "cond" -> render(c),
        "then" -> render(t), "else" -> render(f))
    case PathStep(s, st) =>
      obj("typ" -> q("PathStep"), "src" -> render(s), "step" -> render(st))
    case Filter(s, p) =>
      obj("typ" -> q("FilterStep"), "src" -> render(s),
        "pred" -> render(p))
    case Parens(b) => obj("typ" -> q("Primary"), "body" -> render(b))
    case FnCall(n, args) =>
      obj("typ" -> q("FnCall"), "name" -> q(n),
        "args" -> arr(args.map(render)))
    case Lambda(ps, b) =>
      obj("typ" -> q("FnDef"), "params" -> arr(ps.map(q)),
        "body" -> render(b))
    case Apply(f, args) =>
      obj("typ" -> q("Apply"), "fn" -> render(f),
        "args" -> arr(args.map(render)))
    case Block(bs, r) =>
      obj("typ" -> q("CodeBlock"),
        "bindings" -> arr(bs.map { case (n, v) =>
          obj("var" -> q(n), "val" -> render(v)) }),
        "body" -> render(r))
    case QueryDef(ps, pats, preds, _, _) =>
      obj("typ" -> q("QueryDef"), "params" -> arr(ps.map(q)),
        "patterns" -> arr(pats.map(p => obj(
          "src" -> p.src.map(q).getOrElse("null"),
          "e" -> q(p.e),
          "attr" -> p.attr.fold(r => obj("role" -> q(r)),
            v => obj("qvar" -> q(v))),
          "val" -> render(p.v)))),
        "preds" -> arr(preds.map(render)))
    case ExpressDef(ps, t, _) =>
      obj("typ" -> q("ExpressDef"), "params" -> arr(ps.map(q)),
        "template" -> render(t))
  }

  private def q(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
  private def obj(fields: (String, String)*): String =
    fields.map { case (k, v) => s"${q(k)}: $v" }
      .mkString("{", ", ", "}")
  private def arr(items: Seq[String]): String =
    items.mkString("[", ", ", "]")
}
