package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the `private[sql]` Dataset constructor so graft's custom
  * logical operators (graft.plans) can be wrapped back into a public
  * DataFrame. The one-file-in-spark's-namespace shim is the standard
  * technique for third-party plan extensions; nothing else in the repo
  * lives outside the graft package. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Column → catalyst Expression (the Spark 4 api Column wraps a
    * ColumnNode; the converter lives behind private[sql]). */
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
