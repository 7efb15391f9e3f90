package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Native codegen'd MinHash signature from an array of word hashes:
 * element j of the result is `min over h in input of (a(j)*h + b(j)) % p`
 * — identical to the batch grouped form (16 min() aggregates over the
 * exploded distinct-word rows, `Dedup.minhashSignaturesFromWords`), but
 * computed per ROW so the staging projection needs no explode, no
 * distinct exchange and no aggregation exchange (r17 opt round: the
 * per-batch MinHash staging paid a distinct shuffle + two groupBy
 * shuffles + a join for values that are a pure function of the row).
 */
case class MinhashSigs(child: Expression, a: Array[Long], b: Array[Long],
    p: Long) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  def kernel(input: Any): ArrayData = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val m = a.length
    val out = Array.fill(m)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < m) {
        val v = (a(j) * h + b(j)) % p
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def nullSafeEval(input: Any): Any = kernel(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mhSig", this, classOf[MinhashSigs].getName)
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.kernel($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashSigs {
  def sigs(hm: Column, a: Array[Long], b: Array[Long], p: Long): Column =
    column(MinhashSigs(expression(hm), a, b, p))
}
