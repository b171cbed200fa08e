package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern automaton: one left-to-right pass over
  * the text finds every occurrence (INCLUDING overlapping ones) of
  * every dictionary entry — O(|text| + matches) per row regardless of
  * dictionary size, where a per-keyword `contains` scan is
  * O(|text| · |dict|). Built once at plan construction and shipped
  * with the serialized expression.
  */
final class AcAutomaton(val dict: Array[String]) extends Serializable {
  // dense trie over the observed alphabet; goto as per-node HashMap
  // (dictionaries are small; text chars hash once per char)
  private val gotoMaps =
    scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Char, Int]())
  private val out = scala.collection.mutable.ArrayBuffer(
    List.empty[Int])
  private val fail = scala.collection.mutable.ArrayBuffer(0)

  dict.zipWithIndex.foreach { case (kw, id) =>
    var node = 0
    kw.foreach { ch =>
      val m = gotoMaps(node)
      node = if (m.containsKey(ch)) m.get(ch)
        else {
          gotoMaps += new java.util.HashMap[Char, Int]()
          out += Nil
          fail += 0
          val n = gotoMaps.length - 1
          m.put(ch, n)
          n
        }
    }
    out(node) = id :: out(node)
  }
  // BFS failure links
  locally {
    val queue = new java.util.ArrayDeque[Int]()
    gotoMaps(0).values().forEach(n => queue.add(n))
    while (!queue.isEmpty) {
      val u = queue.poll()
      gotoMaps(u).forEach { (ch, v) =>
        queue.add(v)
        var f = fail(u)
        while (f != 0 && !gotoMaps(f).containsKey(ch)) f = fail(f)
        val link =
          if (gotoMaps(f).containsKey(ch) && gotoMaps(f).get(ch) != v)
            gotoMaps(f).get(ch)
          else 0
        fail(v) = link
        out(v) = out(v) ++ out(link)
      }
    }
  }

  /** Occurrence count per dictionary id (overlaps counted). */
  def countAll(text: String): Array[Long] = {
    val counts = new Array[Long](dict.length)
    var node = 0
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      while (node != 0 && !gotoMaps(node).containsKey(ch))
        node = fail(node)
      if (gotoMaps(node).containsKey(ch))
        node = gotoMaps(node).get(ch)
      out(node).foreach(id => counts(id) += 1)
      i += 1
    }
    counts
  }
}

/** Dictionary tagging over a text column: per row, every dictionary
  * keyword that occurs as a substring with its occurrence count
  * (overlapping occurrences counted), in dictionary order — the
  * topic/PII/blocklist tagging pass of a curation pipeline. Scan-local
  * single pass (see [[AcAutomaton]]); the DuckDB oracle replays the
  * overlap-counting semantics with a position scan per keyword.
  *
  * Returns `array<struct<keyword: string, n: bigint>>` of the
  * keywords with n > 0.
  */
case class KeywordTags(child: Expression, dict: Array[String])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("keyword", StringType, nullable = false),
    StructField("n", LongType, nullable = false))),
    containsNull = false)

  // lazy + transient: Catalyst copies expressions dozens of times
  // during analysis/optimization (withNewChildInternal → copy), and a
  // strict val would rebuild the O(Σ|dict|) trie+BFS on every copy;
  // built once where first evaluated (per JVM after serialization)
  @transient private lazy val auto = new AcAutomaton(dict)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val a = ctx.addReferenceObj("acAuto", auto,
      "graft.functions.AcAutomaton")
    nullSafeCodeGen(ctx, ev, t => {
      s"""
        |${ev.value} = graft.functions.KeywordTags.tag($t, $a);
        |""".stripMargin
    })
  }

  override def nullSafeEval(v: Any): Any =
    KeywordTags.tag(v.asInstanceOf[UTF8String], auto)

  override protected def withNewChildInternal(c: Expression)
      : KeywordTags = copy(c)

  // array field compares by reference in case-class equality
  override def equals(o: Any): Boolean = o match {
    case k: KeywordTags =>
      k.child == child && java.util.Arrays.equals(
        k.dict.asInstanceOf[Array[AnyRef]],
        dict.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(
      java.util.Arrays.hashCode(dict.asInstanceOf[Array[AnyRef]])))
}

object KeywordTags {
  def apply(text: Column, dict: Seq[String]): Column = {
    require(dict.nonEmpty && dict.forall(_.nonEmpty),
      "dictionary must be non-empty keywords")
    ColumnGlue.column(KeywordTags(ColumnGlue.expression(text),
      dict.toArray))
  }

  def tag(text: UTF8String, auto: AcAutomaton): ArrayData = {
    val counts = auto.countAll(text.toString)
    val hits = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < counts.length) {
      if (counts(i) > 0)
        hits += InternalRow(UTF8String.fromString(auto.dict(i)),
          counts(i))
      i += 1
    }
    new GenericArrayData(hits.toArray)
  }
}
