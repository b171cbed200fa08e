package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.unsafe.types.UTF8String

/** All substrings of `word` with length in [minLen, maxLen], in
  * (position, length) order and INCLUDING duplicates — the candidate-
  * piece explosion of unigram-tokenizer seeding, where each occurrence
  * contributes its word's count to the piece weight. One primitive
  * pass; the Column form (nested transform over sequence) trips
  * Spark's descending-sequence edge when len(word) < minLen.
  */
case class WordSubstrings(child: Expression, minLen: Int, maxLen: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, w => {
      s"""
        |${ev.value} = graft.functions.WordSubstrings.compute(
        |  $w, $minLen, $maxLen);
        |""".stripMargin
    })

  override def nullSafeEval(v: Any): Any =
    WordSubstrings.compute(v.asInstanceOf[UTF8String], minLen, maxLen)

  override protected def withNewChildInternal(c: Expression)
      : WordSubstrings = copy(c)
}

object WordSubstrings {
  def apply(word: Column, minLen: Int, maxLen: Int): Column =
    ColumnGlue.column(WordSubstrings(ColumnGlue.expression(word),
      minLen, maxLen))

  def compute(word: UTF8String, minLen: Int, maxLen: Int): ArrayData = {
    val s = word.toString
    val len = s.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var l = minLen
    while (l <= maxLen) {
      var i = 0
      while (i + l <= len) {
        out += UTF8String.fromString(s.substring(i, i + l))
        i += 1
      }
      l += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Shortest-segmentation Viterbi for unigram-tokenizer training
  * ([[graft.pipeline.TextFns.unigramTrain]]): split `word` into the
  * FEWEST pieces such that every piece is either a single character
  * (always valid — the implicit base alphabet, so segmentation is
  * total) or a member of the multi-char `vocab`; among equal-count
  * segmentations the space-joined piece string that compares smallest
  * wins (ASCII tokens, so Java and DuckDB binary collation agree).
  * Integer costs and a total deterministic order — no float anywhere —
  * is what lets the DuckDB oracle replay the DP exactly with a
  * recursive CTE (p_unigram_train).
  *
  * The vocab ships as a plan-baked set (bounded by vocabSize, the
  * k-means literal-centroid idiom); one O(len · maxPieceLen) DP per
  * row, one static call, whole-stage codegen intact.
  */
case class UnigramSegment(child: Expression, vocab: Array[String],
    maxPieceLen: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType)

  // baked once per plan; serialized with the expression
  private val vocabSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.length * 2)
    vocab.foreach(s.add)
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val vs = ctx.addReferenceObj("uniVocab", vocabSet,
      "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, w => {
      s"""
        |${ev.value} = graft.functions.UnigramSegment.segment(
        |  $w, $vs, $maxPieceLen);
        |""".stripMargin
    })
  }

  override def nullSafeEval(v: Any): Any =
    UnigramSegment.segment(v.asInstanceOf[UTF8String], vocabSet,
      maxPieceLen)

  override protected def withNewChildInternal(c: Expression)
      : UnigramSegment = copy(c)

  // array field compares by reference in case-class equality
  override def equals(o: Any): Boolean = o match {
    case u: UnigramSegment =>
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

object UnigramSegment {
  def apply(word: Column, vocab: Array[String],
      maxPieceLen: Int): Column =
    ColumnGlue.column(UnigramSegment(ColumnGlue.expression(word),
      vocab, maxPieceLen))

  /** DP over prefix lengths: best(p) = min over piece lengths l of
    * (best(p−l).count + 1), tie-broken by the space-joined piece
    * string; l = 1 always valid, l ≥ 2 requires vocab membership.
    */
  def segment(word: UTF8String, vocab: java.util.HashSet[String],
      maxPieceLen: Int): ArrayData = {
    val s = word.toString
    val len = s.length
    if (len == 0) return new GenericArrayData(Array.empty[Any])
    val n = new Array[Int](len + 1)
    val key = new Array[String](len + 1)
    n(0) = 0
    key(0) = ""
    var p = 1
    while (p <= len) {
      var bestN = Int.MaxValue
      var bestK: String = null
      var l = 1
      val lMax = math.min(maxPieceLen, p)
      while (l <= lMax) {
        val piece = s.substring(p - l, p)
        if (l == 1 || vocab.contains(piece)) {
          val cn = n(p - l) + 1
          if (cn <= bestN) {
            val ck = if (key(p - l).isEmpty) piece
              else key(p - l) + " " + piece
            if (cn < bestN || ck.compareTo(bestK) < 0) {
              bestN = cn
              bestK = ck
            }
          }
        }
        l += 1
      }
      n(p) = bestN
      key(p) = bestK
      p += 1
    }
    val pieces = key(len).split(" ")
    new GenericArrayData(
      pieces.map(x => UTF8String.fromString(x): Any))
  }
}
