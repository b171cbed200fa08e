package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the few reference semantics that Spark's
  * built-in functions cannot express (SURVEY.md §4 "where custom Catalyst
  * work is actually needed").
  *
  * All are deterministic scalar expressions. CodegenFallback keeps them
  * interpreter-evaluated; they sit at the edge of plans (projections), so
  * the surrounding whole-stage-codegen spans are unaffected except for the
  * single call boundary.
  */

/** JSONata truthiness table (reference `builtin.cljc:943-968`):
  * null→false; boolean→itself; number→(!=0); string→(non-empty);
  * array→(any element truthy); map/struct→(non-empty). Shared by
  * `$boolean`/`$exists`/`$not` and conditionals.
  */
case class JsonataTruthy(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any =
    truthy(child.eval(input), child.dataType)

  private def truthy(v: Any, dt: DataType): Boolean = (v, dt) match {
    case (null, _) => false
    case (b: Boolean, _) => b
    case (n: Byte, _) => n != 0
    case (n: Short, _) => n != 0
    case (n: Int, _) => n != 0
    case (n: Long, _) => n != 0L
    case (n: Float, _) => n != 0f
    case (n: Double, _) => n != 0d
    case (d: Decimal, _) => !d.isZero
    case (s: UTF8String, _) => s.numChars() > 0
    case (a: ArrayData, ArrayType(et, _)) =>
      (0 until a.numElements()).exists(i => truthy(a.get(i, et), et))
    case (m: MapData, _: MapType) => m.numElements() > 0
    case (_: InternalRow, st: StructType) => st.nonEmpty
    case _ => true
  }
  override protected def withNewChildInternal(c: Expression): JsonataTruthy =
    copy(c)
}

/** `$match(str, pattern[, limit])` (reference `builtin.cljc:449-488`):
  * all regex matches as `array<struct<match:string,index:int,groups:array<string>>>`
  * where `index` is the 0-based character offset of the match.
  */
case class JsonataMatch(str: Expression, regex: Expression, limit: Expression)
    extends TernaryExpression with CodegenFallback {
  override def first: Expression = str
  override def second: Expression = regex
  override def third: Expression = limit
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("match", StringType),
    StructField("index", IntegerType),
    StructField("groups", ArrayType(StringType)))))

  // Pattern is a literal in every caller; compile once.
  @transient private lazy val compiled = {
    require(regex.foldable, "$match pattern must be a literal")
    java.util.regex.Pattern.compile(
      regex.eval(null).asInstanceOf[UTF8String].toString)
  }

  override def nullSafeEval(s: Any, r: Any, l: Any): Any = {
    val m = compiled.matcher(s.asInstanceOf[UTF8String].toString)
    val lim = l.asInstanceOf[Int]
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    while (out.size < lim && m.find()) {
      val groups = new GenericArrayData(
        (1 to m.groupCount()).map(g =>
          if (m.group(g) == null) null else UTF8String.fromString(m.group(g)))
          .toArray[Any])
      out += InternalRow(UTF8String.fromString(m.group()), m.start(), groups)
    }
    new GenericArrayData(out.toArray[Any])
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): JsonataMatch =
    copy(f, s, t)
}

/** `$type(v)` (reference `builtin.cljc:1173-1184`): JSONata type name.
  * Static where Spark's type system knows; "null" for runtime nulls.
  */
case class JsonataType(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  @transient private lazy val name: String = child.dataType match {
    case StringType => "string"
    case _: NumericType => "number"
    case BooleanType => "boolean"
    case _: ArrayType => "array"
    case _: MapType | _: StructType => "object"
    case _ => "string"
  }
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    UTF8String.fromString(if (v == null) "null" else name)
  }
  override protected def withNewChildInternal(c: Expression): JsonataType =
    copy(c)
}

/** `$formatNumber(num, picture)` (reference `builtin.cljc:777-808`):
  * XPath F&O picture via `java.text.DecimalFormat` (same engine the
  * reference uses on the JVM). Deterministic; DecimalFormat is not
  * thread-safe so instances are per-thread.
  */
case class FormatNumberPicture(num: Expression, picture: Expression)
    extends BinaryExpression with CodegenFallback {
  override def left: Expression = num
  override def right: Expression = picture
  override def dataType: DataType = StringType
  @transient private lazy val formatter =
    new ThreadLocal[java.text.DecimalFormat] {
      override def initialValue(): java.text.DecimalFormat = {
        require(picture.foldable, "$formatNumber picture must be a literal")
        new java.text.DecimalFormat(
          picture.eval(null).asInstanceOf[UTF8String].toString)
      }
    }
  override def nullSafeEval(n: Any, p: Any): Any = {
    val d = n match {
      case d: Decimal => d.toJavaBigDecimal
      case x: Number => x
    }
    UTF8String.fromString(formatter.get().format(d))
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): FormatNumberPicture = copy(l, r)
}

/** `$formatInteger(num, picture)` (reference `builtin.cljc:813-838`):
  * pictures `A a I i w W Ww` plus digit pictures ("0000").
  */
case class FormatInteger(num: Expression, picture: Expression)
    extends BinaryExpression with CodegenFallback {
  override def left: Expression = num
  override def right: Expression = picture
  override def dataType: DataType = StringType
  override def nullSafeEval(n: Any, p: Any): Any = {
    val v = n.asInstanceOf[Number].longValue()
    UTF8String.fromString(
      NumberWords.formatInteger(v, p.asInstanceOf[UTF8String].toString))
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): FormatInteger = copy(l, r)
}

/** `$parseInteger(str, picture)` (reference `builtin.cljc:872-879`,
  * `util.cljc:262-280`): inverse of formatInteger, including English
  * number words ("four hundred and twenty-seven" → 427).
  */
case class ParseInteger(str: Expression, picture: Expression)
    extends BinaryExpression with CodegenFallback {
  override def left: Expression = str
  override def right: Expression = picture
  override def dataType: DataType = LongType
  override def nullSafeEval(s: Any, p: Any): Any =
    NumberWords.parseInteger(
      s.asInstanceOf[UTF8String].toString,
      p.asInstanceOf[UTF8String].toString)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ParseInteger = copy(l, r)
}
