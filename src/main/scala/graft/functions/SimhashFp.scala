package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{DataType, LongType}

/**
 * Native codegen'd SimHash fingerprint from an array of word hashes:
 * bit i of the result is set iff strictly more array elements have bit i
 * set than clear — identical to the batch grouped form (sum of ±1 per
 * bit > 0, `Dedup.simhashFingerprints`).
 *
 * The declarative per-row alternative — 60 × size(filter(hs, bit-test))
 * — walks the array once per bit through interpreted HigherOrderFunction
 * plumbing (60 lambda evaluations per word). This expression is one
 * fused pass: per word, add its bit pattern into 60 counters; ~100x
 * less interpreter overhead, and it stays inside whole-stage codegen.
 */
case class SimhashFp(child: Expression, bits: Int) extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val cnt = new Array[Int](bits)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var b = 0
      while (b < bits) { cnt(b) += ((h >>> b) & 1L).toInt; b += 1 }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < bits) { if (2 * cnt(b) > n) fp |= (1L << b); b += 1 }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val cnt = ctx.freshName("cnt")
      val fp = ctx.freshName("fp")
      s"""
         |int $n = $a.numElements();
         |int[] $cnt = new int[$bits];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $b = 0; $b < $bits; $b++) {
         |    $cnt[$b] += (int) (($h >>> $b) & 1L);
         |  }
         |}
         |long $fp = 0L;
         |for (int $b = 0; $b < $bits; $b++) {
         |  if (2 * $cnt[$b] > $n) $fp |= (1L << $b);
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimhashFp {
  def fp(hashes: Column, bits: Int): Column = column(SimhashFp(expression(hashes), bits))
}
