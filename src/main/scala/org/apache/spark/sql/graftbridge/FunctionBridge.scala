package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{classic, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Registers a native-expression SQL function on an ALREADY-BUILT session.
 * SparkSessionExtensions is the front door (config
 * spark.sql.extensions=graft.GraftExtensions at session build); this
 * bridge covers sessions the caller didn't build — same pattern Spark's
 * own connectors use. private[sql] surface, hence the package location.
 */
object FunctionBridge {
  def registerTempFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
