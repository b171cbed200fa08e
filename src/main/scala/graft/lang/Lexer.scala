package graft.lang

/** Tokenizer for the expression language (reference `parse.cljc:314-429`
  * — the one-token FSM; ours runs over the whole string at once, the
  * incremental blocking there is a browser-REPL concern).
  */
object Lexer {
  sealed trait Tok
  final case class TNum(v: Double) extends Tok
  final case class TStr(v: String) extends Tok
  final case class TIdent(v: String) extends Tok
  final case class TVar(v: String) extends Tok   // $x ; "" for $, "$" for $$
  final case class TOp(v: String) extends Tok    // operators & punctuation
  final case class TRegex(v: String) extends Tok
  final case class TQvar(v: String) extends Tok  // ?name (query contexts)

  private val keywords = Set("true", "false", "null", "and", "or", "in",
    "function", "not")

  // multi-char operators, longest first
  private val ops = Seq("<|", "|>", ":=", "<=", ">=", "!=", "~>", "..",
    ".", "[", "]", "{", "}", "(", ")", ",", ";", ":", "?", "<", ">", "=",
    "+", "-", "*", "/", "%", "&")

  def tokenize(src: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    var prev: Tok = null
    var prev2: Tok = null
    // true iff the most recently lexed qvar sat in the ENTITY position
    // of a triple pattern (`[?e ...` / multi-source `[$db ?e ...`) —
    // the only place a following `: name` is a keyword attr. A bare
    // 2-token lookback (prev `:` after any qvar) would also fire in a
    // ternary else-branch (`cond ? ?v : a-b`) or a binding-set literal
    // value, turning subtraction into one identifier.
    var lastQvarPatternEntity = false
    def push(t: Tok): Unit = { out += t; prev2 = prev; prev = t }
    while (i < src.length) {
      val c = src(i)
      if (c == '/' && i + 1 < src.length && src(i + 1) == '*') {
        val end = src.indexOf("*/", i + 2)
        require(end >= 0, "unterminated /* comment")
        i = end + 2
      } else if (c.isWhitespace) i += 1
      else if (c.isDigit) {
        val start = i
        while (i < src.length && (src(i).isDigit || src(i) == '.') &&
          !(src(i) == '.' && i + 1 < src.length && src(i + 1) == '.'))
          i += 1
        // exponent part
        if (i < src.length && (src(i) == 'e' || src(i) == 'E')) {
          i += 1
          if (i < src.length && (src(i) == '+' || src(i) == '-')) i += 1
          while (i < src.length && src(i).isDigit) i += 1
        }
        push(TNum(src.substring(start, i).toDouble))
      } else if (c == '\'' || c == '"') {
        val quote = c
        val sb = new StringBuilder
        i += 1
        while (i < src.length && src(i) != quote) {
          if (src(i) == '\\' && i + 1 < src.length) {
            i += 1
            sb.append(src(i) match {
              case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
              case other => other
            })
          } else sb.append(src(i))
          i += 1
        }
        require(i < src.length, s"unterminated string at $i")
        i += 1
        push(TStr(sb.toString))
      } else if (c.isLetter || c == '_') {
        val start = i
        // Keyword attrs in query patterns (`[?e :instance-of ?v]`,
        // query_test.cljc:219) are Clojure-style symbols: hyphens are
        // name characters when ADJACENT on both sides. Only the
        // pattern-attr position (a `:` right after a pattern-ENTITY
        // qvar) lexes them so a ternary/object-literal `: a-b` keeps
        // meaning subtraction — and deciding here, where whitespace is
        // still visible, keeps `[?e :a -x]` from swallowing the
        // spaced `-x` into the name.
        val kwAttr = prev == TOp(":") && prev2.isInstanceOf[TQvar] &&
          lastQvarPatternEntity
        while (i < src.length && (src(i).isLetterOrDigit || src(i) == '_' ||
          (kwAttr && src(i) == '-' && i + 1 < src.length &&
            (src(i + 1).isLetterOrDigit || src(i + 1) == '_'))))
          i += 1
        val w = src.substring(start, i)
        if (keywords.contains(w) &&
          !(w == "in" && prev == null)) push(TOp(w))
        else push(TIdent(w))
      } else if (c == '`') {
        // backquoted name: field with spaces/punctuation, e.g.
        // `Product Name` (JSONata; reference builtin_test.cljc:613)
        val start = i + 1
        i += 1
        while (i < src.length && src(i) != '`') i += 1
        require(i < src.length, s"unterminated backquoted name at $start")
        push(TIdent(src.substring(start, i)))
        i += 1
      } else if (c == '$') {
        if (i + 1 < src.length && src(i + 1) == '$') {
          i += 2; push(TVar("$"))
        } else {
          val start = i + 1
          i += 1
          while (i < src.length && (src(i).isLetterOrDigit || src(i) == '_'))
            i += 1
          push(TVar(src.substring(start, i)))
        }
      } else if (c == '?' && i + 1 < src.length &&
        (src(i + 1).isLetter || src(i + 1) == '_') && qvarPosition(prev)) {
        lastQvarPatternEntity = prev == TOp("[") ||
          (prev.isInstanceOf[TVar] && prev2 == TOp("["))
        val start = i + 1
        i += 1
        // qvars are Clojure-style symbols: hyphens are name characters
        // when followed by a name character (`?class-iri`,
        // query_test.cljc:505-540)
        while (i < src.length && (src(i).isLetterOrDigit ||
          src(i) == '_' || (src(i) == '-' && i + 1 < src.length &&
            (src(i + 1).isLetterOrDigit || src(i + 1) == '_'))))
          i += 1
        push(TQvar(src.substring(start, i)))
      } else if (c == '/' && regexPosition(prev)) {
        val sb = new StringBuilder
        i += 1
        while (i < src.length && src(i) != '/') {
          if (src(i) == '\\' && i + 1 < src.length) {
            sb.append(src(i)).append(src(i + 1)); i += 2
          } else { sb.append(src(i)); i += 1 }
        }
        require(i < src.length, "unterminated regex")
        i += 1
        push(TRegex(sb.toString))
      } else {
        ops.find(op => src.startsWith(op, i)) match {
          case Some(op) => i += op.length; push(TOp(op))
          case None =>
            throw new IllegalArgumentException(
              s"unexpected char '$c' at $i in: $src")
        }
      }
    }
    out.result()
  }

  /** A '/' is a regex literal when an expression (not an operand) is
    * expected — i.e. at the start or after an operator/open paren.
    */
  private def regexPosition(prev: Tok): Boolean = prev match {
    case null => true
    case TOp(op) => !Set("]", ")", "}").contains(op)
    case _ => false
  }

  /** `?name` is a qvar only in query/express/bset positions — after
    * `[ { , :`, another qvar, or a pattern role ident — or as a frame
    * column step right after `.` (`$qfn($db).?sdo`), where no operand
    * precedes so `?` can't be the ternary operator.
    */
  private def qvarPosition(prev: Tok): Boolean = prev match {
    case TOp("[") | TOp("{") | TOp(",") | TOp(":") | TOp("(") |
         TOp(".") => true
    case TQvar(_) | TIdent(_) | TVar(_) => true // $DBa ?e1 patterns
    case _ => false
  }
}
