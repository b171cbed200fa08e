package graft.functions

/** XPath F&O date/time picture → Spark datetime-pattern translator, backing
  * `$fromMillis`/`$now` pictures (reference `builtin.cljc:1205-1298` keeps an
  * equivalent mapping table). Runs driver-side at plan-construction; the
  * resulting pattern feeds `date_format` (codegen'd, distributed).
  *
  * Supported components: [Y*] year, [M*] month, [D*] day, [d] day-of-year,
  * [F*] day name, [H*]/[h*] hours, [m*] minutes, [s*] seconds, [f*]
  * fractional seconds, [P*] am/pm, [Z]/[z] timezone. Width from the digit
  * picture (e.g. `[Y0001]` → `yyyy`, `[M01]` → `MM`, `[H#1]`/`[H1]` → `H`).
  * Name-form (`[MNn]`, `[FNn]`) → `MMMM`/`EEEE`. `[[`/`]]` escape literal
  * brackets; other literal text passes through quoted as needed.
  */
object DatePictures {

  private def widthOf(spec: String): Int = {
    // count mandatory-digit chars; "01" → 2, "0001" → 4, "#1"/"1"/"" → 1
    val digits = spec.count(c => c == '0' || c == '1' || c == '9')
    math.max(digits, 1)
  }

  private def letters(c: Char, n: Int): String = c.toString * n

  private def component(body: String): String = {
    val comp = body.head
    val spec = body.tail
    comp match {
      case 'Y' => letters('y', widthOf(spec))
      case 'M' =>
        if (spec.startsWith("NN")) "MMMM".take(4)
        else if (spec.startsWith("Nn")) "MMMM"
        else if (spec.startsWith("N")) "MMM"
        else letters('M', widthOf(spec))
      case 'D' => letters('d', widthOf(spec))
      case 'd' => letters('D', widthOf(spec))
      case 'F' =>
        if (spec.isEmpty || spec.startsWith("N")) "EEEE" else "EEEE"
      case 'H' => letters('H', widthOf(spec))
      case 'h' => letters('h', widthOf(spec))
      case 'm' => letters('m', widthOf(spec))
      case 's' => letters('s', widthOf(spec))
      case 'f' => letters('S', widthOf(spec))
      case 'P' => "a"
      case 'Z' | 'z' => "XXX"
      case other =>
        throw new IllegalArgumentException(s"date picture component: $other")
    }
  }

  /** Translate an XPath picture to a Spark/Java datetime format pattern. */
  def toSparkPattern(picture: String): String = {
    val sb = new StringBuilder
    var i = 0
    def literal(c: Char): Unit =
      if (c.isLetter) sb.append('\'').append(c).append('\'') else sb.append(c)
    while (i < picture.length) {
      picture(i) match {
        case '[' if i + 1 < picture.length && picture(i + 1) == '[' =>
          literal('['); i += 2
        case ']' if i + 1 < picture.length && picture(i + 1) == ']' =>
          literal(']'); i += 2
        case '[' =>
          val end = picture.indexOf(']', i)
          require(end > i, s"unclosed [ in picture: $picture")
          sb.append(component(picture.substring(i + 1, end)))
          i = end + 1
        case c => literal(c); i += 1
      }
    }
    sb.toString
  }
}
