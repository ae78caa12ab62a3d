package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Package-access bridge: Spark 4 hides the Column ⇄ Expression conversions
  * behind `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`),
  * so custom Catalyst expressions need a shim inside the sql package tree
  * to surface as user-facing `Column`s. Also exposes temp-function
  * registration for SQL-callable custom expressions.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  def registerTempFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
