package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{DataType, DoubleType}

/**
 * Raw log-likelihood ratio (LLR) of a 2x2 contingency table, via the
 * unnormalized-entropy identity with 9 log calls.
 *
 * Semantics match the reference engine's scalar function
 * (reference: LogLikelihood.java:41-61, itself derived from Apache Mahout's
 * org.apache.mahout.math.stats.LogLikelihood): `xLogX(0) == 0` and negative
 * round-off results are clamped to exactly 0.0.
 */
object LogLikelihood {

  @inline private def xLogX(x: Long): Double =
    if (x == 0L) 0.0 else x * math.log(x.toDouble)

  /** Scala-side implementation; also the interpreted path of [[LlrExpression]]. */
  def logLikelihoodRatio(k11: Long, k12: Long, k21: Long, k22: Long): Double = {
    val k11k12 = k11 + k12
    val k21k22 = k21 + k22
    val all = xLogX(k11k12 + k21k22)
    val row = all - xLogX(k11k12) - xLogX(k21k22)
    val column = all - xLogX(k11 + k21) - xLogX(k12 + k22)
    val matrix = all - xLogX(k11) - xLogX(k12) - xLogX(k21) - xLogX(k22)
    if (row + column < matrix) 0.0 // round-off
    else 2.0 * (row + column - matrix)
  }

  /** Column-level LLR, codegen'd (stays inside whole-stage codegen). */
  def llr(k11: Column, k12: Column, k21: Column, k22: Column): Column =
    column(LlrExpression(expression(k11), expression(k12), expression(k21), expression(k22)))
}

/**
 * Native Catalyst expression for the LLR so scoring stays inside
 * whole-stage codegen instead of falling out to a Scala UDF boundary.
 */
case class LlrExpression(first: Expression, second: Expression, third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  // Inputs must already be LongType; graft.functions.LogLikelihood.llr casts.
  override def dataType: DataType = DoubleType
  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable || fourth.nullable

  override protected def nullSafeEval(k11: Any, k12: Any, k21: Any, k22: Any): Any =
    LogLikelihood.logLikelihoodRatio(
      k11.asInstanceOf[Long], k12.asInstanceOf[Long], k21.asInstanceOf[Long], k22.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = LogLikelihood.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, (a, b, c, d) => s"$cls.logLikelihoodRatio($a, $b, $c, $d)")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}
