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

  /** `org.apache.spark.sql.types.AbstractDataType` is private[sql] in
    * Spark 4; this public alias lets graft expressions declare
    * `inputTypes` (so the analyzer coerces e.g. array&lt;float&gt; →
    * array&lt;double&gt;) without living inside the sql package.
    */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType
}
