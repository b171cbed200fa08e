package graft.functions

/** Pure-JVM integer picture formatting/parsing backing `$formatInteger` /
  * `$parseInteger` (reference `builtin.cljc:813-838,872-879`,
  * `util.cljc:262-280`). Pictures: `A` `a` (alphabetic), `I` `i` (roman),
  * `w` `W` `Ww` (English words), and decimal-digit pictures like `0000`.
  */
object NumberWords {

  private val romanPairs = Seq(
    1000 -> "M", 900 -> "CM", 500 -> "D", 400 -> "CD", 100 -> "C",
    90 -> "XC", 50 -> "L", 40 -> "XL", 10 -> "X", 9 -> "IX",
    5 -> "V", 4 -> "IV", 1 -> "I")

  def toRoman(n: Long): String = {
    require(n > 0 && n < 4000, s"roman numeral out of range: $n")
    var rem = n
    val sb = new StringBuilder
    romanPairs.foreach { case (v, sym) =>
      while (rem >= v) { sb.append(sym); rem -= v }
    }
    sb.toString
  }

  def fromRoman(s: String): Long = {
    val vals = Map('I' -> 1, 'V' -> 5, 'X' -> 10, 'L' -> 50,
      'C' -> 100, 'D' -> 500, 'M' -> 1000)
    val u = s.toUpperCase
    var total = 0L
    var i = 0
    while (i < u.length) {
      val v = vals(u(i))
      if (i + 1 < u.length && vals(u(i + 1)) > v) total -= v else total += v
      i += 1
    }
    total
  }

  /** 1→"a", 26→"z", 27→"aa" (bijective base-26, JSONata 'a' picture). */
  def toAlpha(n: Long): String = {
    require(n > 0, s"alphabetic picture needs positive: $n")
    var rem = n
    val sb = new StringBuilder
    while (rem > 0) {
      rem -= 1
      sb.insert(0, ('a' + (rem % 26).toInt).toChar)
      rem /= 26
    }
    sb.toString
  }

  def fromAlpha(s: String): Long =
    s.toLowerCase.foldLeft(0L)((acc, c) => acc * 26 + (c - 'a' + 1))

  private val onesWords = Array("zero", "one", "two", "three", "four", "five",
    "six", "seven", "eight", "nine", "ten", "eleven", "twelve", "thirteen",
    "fourteen", "fifteen", "sixteen", "seventeen", "eighteen", "nineteen")
  private val tensWords = Array("", "", "twenty", "thirty", "forty", "fifty",
    "sixty", "seventy", "eighty", "ninety")
  private val scales = Seq(
    1000000000000L -> "trillion", 1000000000L -> "billion",
    1000000L -> "million", 1000L -> "thousand")

  /** English words with JSONata/XPath "and": 427 → "four hundred and
    * twenty-seven".
    */
  def toWords(n: Long): String = {
    if (n < 0) return "minus " + toWords(-n)
    if (n < 20) return onesWords(n.toInt)
    if (n < 100) {
      val t = tensWords((n / 10).toInt)
      return if (n % 10 == 0) t else s"$t-${onesWords((n % 10).toInt)}"
    }
    if (n < 1000) {
      val h = s"${onesWords((n / 100).toInt)} hundred"
      return if (n % 100 == 0) h else s"$h and ${toWords(n % 100)}"
    }
    scales.find(n >= _._1) match {
      case Some((v, name)) =>
        val head = s"${toWords(n / v)} $name"
        val rest = n % v
        if (rest == 0) head
        else if (rest < 100) s"$head and ${toWords(rest)}"
        else s"$head, ${toWords(rest)}"
      case None => throw new IllegalArgumentException(s"toWords: $n")
    }
  }

  private val wordValues: Map[String, Long] =
    onesWords.zipWithIndex.map { case (w, i) => w -> i.toLong }.toMap ++
      tensWords.zipWithIndex.collect {
        case (w, i) if w.nonEmpty => w -> (i * 10L)
      }.toMap
  private val scaleValues: Map[String, Long] =
    Map("hundred" -> 100L) ++ scales.map { case (v, w) => w -> v }

  def fromWords(s: String): Long = {
    val tokens = s.toLowerCase
      .replace(",", " ").replace("-", " ").split("\\s+")
      .filter(t => t.nonEmpty && t != "and")
    val neg = tokens.headOption.contains("minus")
    var total = 0L
    var current = 0L
    tokens.dropWhile(_ == "minus").foreach { t =>
      wordValues.get(t) match {
        case Some(v) => current += v
        case None => scaleValues.get(t) match {
          case Some(100L) => current *= 100
          case Some(mult) => total += current * mult; current = 0
          case None =>
            throw new IllegalArgumentException(s"parseInteger: '$t'")
        }
      }
    }
    val r = total + current
    if (neg) -r else r
  }

  def formatInteger(n: Long, picture: String): String = picture match {
    case "A" => toAlpha(n).toUpperCase
    case "a" => toAlpha(n)
    case "I" => toRoman(n)
    case "i" => toRoman(n).toLowerCase
    case "w" => toWords(n)
    case "W" => toWords(n).toUpperCase
    case "Ww" => toWords(n).split(" ").map(_.capitalize).mkString(" ")
    case p if p.nonEmpty && p.forall(c => c == '0' || c == '#' || c == ',') =>
      new java.text.DecimalFormat(p).format(n)
    case p => throw new IllegalArgumentException(s"formatInteger picture: $p")
  }

  def parseInteger(s: String, picture: String): Long = picture match {
    case "A" | "a" => fromAlpha(s)
    case "I" | "i" => fromRoman(s)
    case "w" | "W" | "Ww" => fromWords(s)
    case _ => s.replace(",", "").toLong
  }
}
