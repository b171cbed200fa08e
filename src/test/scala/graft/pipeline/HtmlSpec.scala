package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** TextFns.htmlToText rule-chain semantics on hand-written fixtures. */
class HtmlSpec extends SparkSpec {

  private def extract(html: String): String = {
    import spark.implicits._
    Seq(html).toDF("h").select(TextFns.htmlToText(col("h"))).head
      .getString(0)
  }

  test("full page: head dropped, blocks become newlines, tags strip") {
    val html = "<html><head><title>nav title</title>" +
      "<style>p { x: 1; }</style></head><body>" +
      "<h1 id=\"a\">Head</h1><p>one two</p>" +
      "<div><a href=\"http://x\">a link</a> tail</div></body></html>"
    assert(extract(html) == "Head\none two\na link tail")
  }

  test("script survives a raw '<' in code and case variation") {
    val html = "before<SCRIPT type=\"x\">if (1 < 2) { y(\"</p>\"); }" +
      "</ScRiPt>after"
    assert(extract(html) == "beforeafter")
  }

  test("comments removed across newlines") {
    assert(extract("a<!-- multi\nline\ncomment -->b") == "ab")
  }

  test("entities decode once; double-escape stays escaped") {
    // standard double-escape behavior: &amp;lt; renders as the literal
    // text "&lt;" (decoded exactly once, cannot re-form a tag)
    assert(extract("x &lt;b&gt; &amp; &quot;q&quot; &#39;a&#39;" +
      " &amp;lt;") == "x <b> & \"q\" 'a' &lt;")
  }

  test("br and self-closing br break lines; 3+ newlines collapse") {
    assert(extract("a<br>b<br/>c<br><br><br>d") == "a\nb\nc\n\nd")
  }

  test("whitespace collapses and the result is trimmed") {
    // the source blank lines + the </p> newline collapse to ONE
    // paragraph break (two newlines), never more
    assert(extract("  <p>a\t\tb</p>\n\n\n  <p>c</p>  ") ==
      "a b\n\nc")
  }

  private def canon(url: String): String = {
    import spark.implicits._
    Seq(url).toDF("u").select(TextFns.canonicalizeUrl(col("u")))
      .head.getString(0)
  }

  test("canonicalizeUrl: scheme/host case, ports, slashes, params") {
    assert(canon("HTTP://WWW.Ex.COM:80//A//b/?b=2&a=1&utm_source=x#f")
      == "http://www.ex.com/A/b?a=1&b=2")
    // path case preserved; https default port stripped, http's kept
    assert(canon("https://Ex.com:443/Case") == "https://ex.com/Case")
    assert(canon("http://ex.com:443/x") == "http://ex.com:443/x")
    // bare authority gets the root path; empty query drops the '?'
    assert(canon("https://ex.com") == "https://ex.com/")
    assert(canon("https://ex.com/p?utm_campaign=a&gclid=b") ==
      "https://ex.com/p")
    // generic 'ref' is SEMANTIC on real sites (GitHub branch refs) —
    // kept by default; Twitter's ref_src tracking decoration dropped
    assert(canon("http://e.com/p?referrer=x&ref=main&ref_src=tw") ==
      "http://e.com/p?ref=main&referrer=x")
    // caller-supplied tracking list can opt into merging 'ref'
    import spark.implicits._
    val aggressive = Seq("http://e.com/p?ref=y&a=1").toDF("u")
      .select(TextFns.canonicalizeUrl(col("u"),
        TextFns.TrackingParams + "|ref")).head.getString(0)
    assert(aggressive == "http://e.com/p?a=1")
    // userinfo is case-SENSITIVE (RFC 3986: only scheme and host are
    // case-insensitive) — host lowercases around it, through the LAST @
    assert(canon("HTTPS://User:PW@Ex.COM/p") ==
      "https://User:PW@ex.com/p")
    assert(canon("http://A@B@Ex.COM/p") == "http://A@B@ex.com/p")
    // non-URLs pass through untouched
    assert(canon("not a url") == "not a url")
  }

  test("graft_html_text SQL surface matches the Column form") {
    graft.GraftExtensions.registerFunctions(spark)
    val got = spark.sql(
      "SELECT graft_html_text('<p>x</p><p>y</p>')").head.getString(0)
    assert(got == "x\ny")
  }

  test("graft_wordpiece SQL surface segments with the csv vocab") {
    graft.GraftExtensions.registerFunctions(spark)
    val got = spark.sql("SELECT graft_wordpiece('windows win', " +
      "'wind,##ow,##s,win')").head.getSeq[String](0)
    assert(got == Seq("wind", "##ow", "##s", "win"))
  }
}
