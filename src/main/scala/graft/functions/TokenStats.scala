package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.unsafe.types.UTF8String

/** Per-row token frequency vector: the row-local half of corpus
  * vocabulary statistics. One pass over the text builds
  * `array<struct<token, cnt>>` (first-occurrence order), so the
  * corpus-level tf/df aggregation needs ONE explode of the distinct
  * tokens per document and ONE shuffle — instead of exploding every
  * token occurrence (tf branch) plus every distinct token (df branch)
  * and joining the two aggregations. At 100 TB that halves the scan
  * count and removes a whole explode+shuffle+join from the vocabulary
  * pass (see TextFns.docFrequency).
  *
  * Token semantics = Dedup.tokens (lowercase via Spark's collation-
  * aware mapping, split "[^a-z0-9]+", empties dropped) — the exact
  * multiset the DuckDB oracle replays with str_split_regex(lower()).
  */
object TokenStatsNative {
  /** First-occurrence-ordered (token, count) array; `vocab == null`
    * counts every token, otherwise only members (the shared loop of
    * [[TokenCounts]] and [[TokenPostings]]).
    */
  private[functions] def countsOf(toks: Array[String],
      vocab: java.util.HashSet[String]): GenericArrayData = {
    val m = new java.util.LinkedHashMap[String, java.lang.Long]()
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if ((vocab eq null) || vocab.contains(t)) {
        val prev = m.get(t)
        m.put(t, if (prev eq null) 1L else prev.longValue() + 1L)
      }
      i += 1
    }
    val out = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      out(k) = InternalRow(UTF8String.fromString(e.getKey),
        e.getValue.longValue())
      k += 1
    }
    new GenericArrayData(out)
  }

  def tokenCounts(text: UTF8String, useICU: Boolean): GenericArrayData =
    countsOf(TextHash.tokensOf(text, useICU), null)

  /** Adjacent-token bigram occurrence counts ("a b" keys, same
    * tokenization and count shape as [[tokenCounts]]) — the
    * collocation-mining input. Occurrences, not per-doc presence:
    * PMI's probabilities are corpus frequencies.
    */
  def bigramCounts(text: UTF8String, useICU: Boolean): GenericArrayData = {
    val toks = TextHash.tokensOf(text, useICU)
    val n = if (toks.length > 0) toks.length - 1 else 0
    val bgs = new Array[String](n)
    var i = 0
    while (i < n) {
      bgs(i) = toks(i) + " " + toks(i + 1)
      i += 1
    }
    countsOf(bgs, null)
  }
}

/** `tokenCounts(text)` as one codegen'd call →
  * array<struct<token:string, cnt:long>>, first-occurrence order.
  */
case class TokenCounts(child: Expression,
    useICU: Boolean = TextHash.resolveUseICU()) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, false),
    StructField("cnt", LongType, false))), false)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TokenStatsNative.tokenCounts($c, $useICU)")
  override def nullSafeEval(v: Any): Any =
    TokenStatsNative.tokenCounts(v.asInstanceOf[UTF8String], useICU)
  override protected def withNewChildInternal(c: Expression): TokenCounts =
    copy(child = c)
}

object TokenCounts {
  def apply(text: Column): Column =
    ColumnGlue.column(TokenCounts(ColumnGlue.expression(text)))
}

/** `bigramCounts(text)` as one codegen'd call →
  * array<struct<token:string, cnt:long>> of adjacent-token bigram
  * occurrence counts, first-occurrence order.
  */
case class BigramCounts(child: Expression,
    useICU: Boolean = TextHash.resolveUseICU()) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, false),
    StructField("cnt", LongType, false))), false)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TokenStatsNative.bigramCounts($c, $useICU)")
  override def nullSafeEval(v: Any): Any =
    TokenStatsNative.bigramCounts(v.asInstanceOf[UTF8String], useICU)
  override protected def withNewChildInternal(c: Expression): BigramCounts =
    copy(child = c)
}

object BigramCounts {
  def apply(text: Column): Column =
    ColumnGlue.column(BigramCounts(ColumnGlue.expression(text)))
}

/** `TokenPostings(text, vocab)` → struct<dl:long,
  * q:array<struct<token:string, cnt:long>>>: document length (total
  * token count) plus the postings restricted to a plan-baked
  * vocabulary, in ONE codegen'd call — the BM25 scan projection
  * ([[graft.pipeline.TextFns.bm25]]/`bm25Queries`) without the
  * interpreted aggregate/filter lambdas it previously paid per
  * document. First-occurrence posting order matches
  * `filter(tokenCounts(text), isin(vocab))` exactly.
  */
case class TokenPostings(child: Expression, vocab: Array[String],
    useICU: Boolean = TextHash.resolveUseICU())
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("dl", LongType, false),
    StructField("q", ArrayType(StructType(Seq(
      StructField("token", StringType, false),
      StructField("cnt", LongType, false))), false), false)))

  // @transient lazy: Catalyst copies expressions on every transform
  // during analysis/optimization, and a strict val would rebuild this
  // HashSet (up to 65,536 bm25Queries terms) per copy — the KeywordTags
  // pattern; recomputed on demand from `vocab` after deserialization
  @transient private lazy val vocabSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.length * 2)
    vocab.foreach(s.add)
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val vs = ctx.addReferenceObj("bmVocab", vocabSet,
      "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
        |${ev.value} = graft.functions.TokenPostings.compute(
        |  $c, $vs, $useICU);
        |""".stripMargin
    })
  }

  override def nullSafeEval(v: Any): Any =
    TokenPostings.compute(v.asInstanceOf[UTF8String], vocabSet, useICU)

  override protected def withNewChildInternal(c: Expression)
      : TokenPostings = copy(child = c)

  override def equals(o: Any): Boolean = o match {
    case t: TokenPostings =>
      t.child == child && t.useICU == useICU &&
        java.util.Arrays.equals(
          t.vocab.asInstanceOf[Array[AnyRef]],
          vocab.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, java.lang.Boolean.valueOf(useICU),
      Integer.valueOf(java.util.Arrays.hashCode(
        vocab.asInstanceOf[Array[AnyRef]])))
}

object TokenPostings {
  def apply(text: Column, vocab: Array[String]): Column =
    ColumnGlue.column(TokenPostings(ColumnGlue.expression(text), vocab))

  def compute(text: UTF8String, vocab: java.util.HashSet[String],
      useICU: Boolean): InternalRow = {
    val toks = TextHash.tokensOf(text, useICU)
    InternalRow(toks.length.toLong,
      TokenStatsNative.countsOf(toks, vocab))
  }
}
