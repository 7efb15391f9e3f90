package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{DataType, LongType}

/**
 * Native codegen'd dot product of two long-array columns.
 *
 * The declarative alternative — aggregate(zip_with(a, b, _*_), 0, _+_) —
 * allocates an intermediate array and evaluates the lambda per element
 * through interpreted HigherOrderFunction plumbing, which dominated the
 * all-pairs similarity scan (~18us/pair). This expression is a tight
 * fused loop inside whole-stage codegen (~0.1us/pair at 64 dims).
 */
case class LongArrayDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0L
    var i = 0
    while (i < n) { sum += x.getLong(i) * y.getLong(i); i += 1 }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $sum = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LongArrayDot {
  def dot(a: Column, b: Column): Column = column(LongArrayDot(expression(a), expression(b)))
}
