package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to Spark's private[sql] Column ↔ Expression
  * converters (`org.apache.spark.sql.classic.ExpressionUtils`), the
  * supported classic-mode path for lifting a custom Catalyst
  * `Expression` into the public Column API in Spark 4.x. Lives under
  * org.apache.spark.sql for package-private access; keep this file
  * free of any logic.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Execute a logical plan as a DataFrame (classic-mode
    * `Dataset.ofRows`, private[sql]) — used by plan-rewrite specs to
    * run a rule's output and value-compare it against the original.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** `org.apache.spark.sql.types.AbstractDataType` is private[sql] in
    * Spark 4; this public alias lets graft expressions declare
    * `inputTypes` (so the analyzer coerces e.g. array&lt;float&gt; →
    * array&lt;double&gt;) without living inside the sql package.
    */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType
}
