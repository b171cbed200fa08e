package graft.sources

/** Minimal EDN reader (no external deps) for the reference's `.edn`
  * fixtures (`$read('data/testing/owl-example.edn')`,
  * `query_test.cljc:502-540`; bsets fixture `jsonata/bsets.edn`).
  *
  * Scope: nil/booleans/numbers/strings/keywords/symbols, vectors,
  * lists, maps, sets (→ arrays), `;` comments, `,` as whitespace,
  * tagged literals (tag skipped, value kept). Keywords normalize to
  * strings with `/` → `_` — the same ns_name flattening the reference
  * applies to qualified names when rendering to the mapping surface
  * (`:rdf/type :owl/Class` queries as `[?c :rdf_type 'owl_Class']`).
  *
  * Output is a JSON string, so ingestion shares the JSON document
  * pipeline (schema inference, nested shapes).
  */
object Edn {

  def toJson(src: String): String = {
    val p = new P(src)
    val v = p.value()
    p.skipWs()
    require(p.atEnd, s"trailing EDN content at offset ${p.pos}")
    v
  }

  private final class P(s: String) {
    var pos = 0
    def atEnd: Boolean = pos >= s.length
    private def ch: Char = s.charAt(pos)

    def skipWs(): Unit = {
      var go = true
      while (go && !atEnd) {
        if (ch == ';') { while (!atEnd && ch != '\n') pos += 1 }
        else if (ch.isWhitespace || ch == ',') pos += 1
        else go = false
      }
    }

    private def isSymChar(c: Char): Boolean =
      c.isLetterOrDigit || "*+!-_?./<>=$%&#':".contains(c)

    def value(): String = {
      skipWs()
      require(!atEnd, "unexpected end of EDN")
      ch match {
        case '[' | '(' => seq(if (ch == '[') ']' else ')')
        case '{' => map()
        case '#' =>
          if (pos + 1 < s.length && s.charAt(pos + 1) == '{') {
            pos += 1; seq('}') // set → array
          } else if (pos + 1 < s.length && s.charAt(pos + 1) == '_') {
            pos += 2; value(); value() // #_ discard form
          } else { // tagged literal: skip the tag symbol, keep value
            pos += 1
            while (!atEnd && isSymChar(ch)) pos += 1
            value()
          }
        case '"' => string()
        case ':' =>
          pos += 1
          jsonStr(symbol().replace('/', '_'))
        case c if c == '-' || c == '+' || c.isDigit =>
          number()
        case _ =>
          val sym = symbol()
          sym match {
            case "nil" => "null"
            case "true" => "true"
            case "false" => "false"
            case other => jsonStr(other.replace('/', '_'))
          }
      }
    }

    private def seq(close: Char): String = {
      pos += 1 // open
      val items = Seq.newBuilder[String]
      skipWs()
      while (!atEnd && ch != close) { items += value(); skipWs() }
      require(!atEnd, s"unterminated sequence (expected $close)")
      pos += 1
      items.result().mkString("[", ",", "]")
    }

    private def map(): String = {
      pos += 1
      val entries = Seq.newBuilder[String]
      skipWs()
      while (!atEnd && ch != '}') {
        val k = value()
        val v = value()
        // map keys render as strings (keywords already are)
        val key = if (k.startsWith("\"")) k else jsonStr(k)
        entries += s"$key:$v"
        skipWs()
      }
      require(!atEnd, "unterminated map")
      pos += 1
      entries.result().mkString("{", ",", "}")
    }

    private def string(): String = {
      pos += 1
      val sb = new StringBuilder
      while (!atEnd && ch != '"') {
        if (ch == '\\' && pos + 1 < s.length) {
          pos += 1
          sb.append(ch match {
            case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
            case other => other
          })
        } else sb.append(ch)
        pos += 1
      }
      require(!atEnd, "unterminated string")
      pos += 1
      jsonStr(sb.result())
    }

    private def number(): String = {
      val start = pos
      if (ch == '-' || ch == '+') pos += 1
      while (!atEnd && (ch.isDigit || ch == '.' || ch == 'e' || ch == 'E' ||
        ((ch == '-' || ch == '+') && "eE".contains(s.charAt(pos - 1)))))
        pos += 1
      var text = s.substring(start, pos)
      // M (bigdec) / N (bigint) markers
      if (!atEnd && (ch == 'M' || ch == 'N')) pos += 1
      if (text.startsWith("+")) text = text.substring(1)
      text
    }

    private def symbol(): String = {
      val start = pos
      while (!atEnd && isSymChar(ch)) pos += 1
      require(pos > start, s"expected symbol at offset $start")
      s.substring(start, pos)
    }

    private def jsonStr(v: String): String =
      "\"" + v.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
  }
}
