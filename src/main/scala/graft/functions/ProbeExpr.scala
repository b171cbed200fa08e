package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

case class ProbeReverse(child: Expression) extends UnaryExpression
    with codegen.CodegenFallback {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(v.asInstanceOf[UTF8String].toString.reverse)
  override protected def withNewChildInternal(c: Expression): ProbeReverse =
    copy(c)
}

object ProbeExpr {
  import org.apache.spark.sql.graftglue.ColumnGlue
  def probeReverse(c: Column): Column =
    ColumnGlue.column(ProbeReverse(ColumnGlue.expression(c)))
}
