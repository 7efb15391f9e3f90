package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.LongType

import graft.functions.{LlrExpression, LongArrayDot, SimhashFp, SortedIntersectSize}

/**
 * SparkSessionExtensions entry point: exposes the engine's native
 * Catalyst expressions to the SQL frontend, so `spark.sql("... llr(...)
 * ...")` plans the codegen'd expression — no UDF boundary.
 *
 * Use at session build:
 *   spark.sql.extensions=graft.GraftExtensions
 * or on an existing session: `GraftExtensions.register(spark)`.
 *
 * Reference mapping: the LLR scalar (LogLikelihood.java:41-61) becomes a
 * first-class SQL function — the reference has no SQL surface at all, so
 * this is strictly new capability on top of operator parity.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("llr"),
      GraftExtensions.llrInfo,
      GraftExtensions.llrBuilder))
    ext.injectFunction((
      FunctionIdentifier("long_array_dot"),
      GraftExtensions.dotInfo,
      GraftExtensions.dotBuilder))
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_size"),
      GraftExtensions.intersectInfo,
      GraftExtensions.intersectBuilder))
    ext.injectFunction((
      FunctionIdentifier("simhash_fp"),
      GraftExtensions.simhashInfo,
      GraftExtensions.simhashBuilder))
  }
}

object GraftExtensions {

  private[graft] val llrInfo = new ExpressionInfo(
    classOf[LlrExpression].getName, null, "llr",
    "llr(k11, k12, k21, k22) - raw log-likelihood ratio of a 2x2 contingency table",
    "")

  private[graft] val llrBuilder: Seq[Expression] => Expression = { args =>
    require(args.length == 4, "llr(k11, k12, k21, k22) takes exactly 4 arguments")
    val Seq(a, b, c, d) = args.map(e => Cast(e, LongType)): @unchecked
    LlrExpression(a, b, c, d)
  }

  private[graft] val dotInfo = new ExpressionInfo(
    classOf[LongArrayDot].getName, null, "long_array_dot",
    "long_array_dot(a, b) - dot product of two array<bigint> columns",
    "")

  private[graft] val dotBuilder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, "long_array_dot(a, b) takes exactly 2 arguments")
    LongArrayDot(args(0), args(1))
  }

  private[graft] val intersectInfo = new ExpressionInfo(
    classOf[SortedIntersectSize].getName, null, "sorted_intersect_size",
    "sorted_intersect_size(a, b) - intersection size of two sorted distinct array<bigint> columns",
    "")

  private[graft] val intersectBuilder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, "sorted_intersect_size(a, b) takes exactly 2 arguments")
    SortedIntersectSize(args(0), args(1))
  }

  private[graft] val simhashInfo = new ExpressionInfo(
    classOf[SimhashFp].getName, null, "simhash_fp",
    "simhash_fp(hashes[, bits]) - SimHash fingerprint of an array<bigint> of element hashes " +
      "(bit i set iff more elements have bit i set than clear; default 60 bits)",
    "")

  private[graft] val simhashBuilder: Seq[Expression] => Expression = { args =>
    require(args.length == 1 || args.length == 2,
      "simhash_fp(hashes[, bits]) takes 1 or 2 arguments")
    val bits = if (args.length == 2) args(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => other.eval(null) match {
        case i: Int => i
        case l: Long => l.toInt
        case _ => throw new IllegalArgumentException("simhash_fp: bits must be a literal int")
      }
    } else PortableHashBits
    require(bits >= 1 && bits <= 63, "simhash_fp: bits must be in [1, 63]")
    SimhashFp(args(0), bits)
  }

  private val PortableHashBits = graft.operators.PortableHash.SimHashBits

  /** Register the function set on an already-built session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val fb = org.apache.spark.sql.graftbridge.FunctionBridge
    fb.registerTempFunction(spark, "llr", llrBuilder)
    fb.registerTempFunction(spark, "long_array_dot", dotBuilder)
    fb.registerTempFunction(spark, "sorted_intersect_size", intersectBuilder)
    fb.registerTempFunction(spark, "simhash_fp", simhashBuilder)
  }
}
