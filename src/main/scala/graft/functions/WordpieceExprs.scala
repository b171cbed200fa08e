package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match-first WordPiece segmentation (Wu et al. 2016;
  * the BERT tokenizer's encode step): from the word start, repeatedly
  * take the LONGEST vocab piece matching at the cursor — pieces after
  * the first match with a "##" continuation prefix — and if no piece
  * matches at some cursor the WHOLE word encodes as the single
  * `[UNK]` token (BERT semantics: unknown-at-any-point poisons the
  * word, partial pieces are discarded).
  *
  * Unlike [[UnigramSegment]] there is no DP: first-match greedy is the
  * defining semantics, which also makes the DuckDB replay a linear
  * recursive CTE (one child per step). Vocab ships as a plan-baked
  * set (the k-means literal-centroid idiom); one O(len · maxPieceLen)
  * pass per word, static call, whole-stage codegen intact.
  *
  * Training is out of scope by design — in practice WordPiece vocabs
  * come from a BPE-style merge loop ([[graft.pipeline.TextFns.bpeTrain]])
  * or unigram pruning ([[graft.pipeline.TextFns.unigramTrain]]); this
  * kernel is the encode-with-given-vocab step.
  */
case class WordpieceSegment(child: Expression, vocab: Array[String],
    maxPieceLen: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType)

  // @transient lazy: Catalyst copies expressions on every transform,
  // and a strict val would rebuild the vocab HashSet per copy (the
  // KeywordTags fix); recomputed from `vocab` after deserialization
  @transient private lazy val vocabSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.length * 2)
    vocab.foreach(s.add)
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val vs = ctx.addReferenceObj("wpVocab", vocabSet,
      "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, w => {
      s"""
        |${ev.value} = graft.functions.WordpieceSegment.segment(
        |  $w, $vs, $maxPieceLen);
        |""".stripMargin
    })
  }

  override def nullSafeEval(v: Any): Any =
    WordpieceSegment.segment(v.asInstanceOf[UTF8String], vocabSet,
      maxPieceLen)

  override protected def withNewChildInternal(c: Expression)
      : WordpieceSegment = copy(c)

  // array field compares by reference in case-class equality
  override def equals(o: Any): Boolean = o match {
    case u: WordpieceSegment =>
      u.child == child && u.maxPieceLen == maxPieceLen &&
        java.util.Arrays.equals(
          u.vocab.asInstanceOf[Array[AnyRef]],
          vocab.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(maxPieceLen),
      Integer.valueOf(java.util.Arrays.hashCode(
        vocab.asInstanceOf[Array[AnyRef]])))
}

object WordpieceSegment {

  val Unk = "[UNK]"

  def apply(word: Column, vocab: Array[String],
      maxPieceLen: Int): Column =
    ColumnGlue.column(WordpieceSegment(ColumnGlue.expression(word),
      vocab, maxPieceLen))

  def segment(word: UTF8String, vocab: java.util.HashSet[String],
      maxPieceLen: Int): ArrayData = {
    val s = word.toString
    val len = s.length
    if (len == 0) return new GenericArrayData(Array.empty[Any])
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var pos = 0
    while (pos < len) {
      var l = math.min(maxPieceLen, len - pos)
      var piece: String = null
      while (l >= 1 && piece == null) {
        val cand =
          if (pos == 0) s.substring(0, l)
          else "##" + s.substring(pos, pos + l)
        if (vocab.contains(cand)) piece = cand else l -= 1
      }
      if (piece == null)
        return new GenericArrayData(
          Array[Any](UTF8String.fromString(Unk)))
      out += UTF8String.fromString(piece)
      pos += l
    }
    new GenericArrayData(out.toArray)
  }
}
