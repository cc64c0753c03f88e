package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark SQL lacks natively
  * (build brief: compose existing ops when semantics allow; this is
  * the composition path, no custom SparkPlan needed).
  *
  * For each left row, attach the LATEST right row of the same key
  * with right.ts <= left.ts ("at or before"; equal timestamps match).
  *
  * Implementation: tag + union + per-key ordered window with
  * last(ignoreNulls) over the unbounded-preceding frame, then keep
  * the left rows. This is the scalable formulation: ONE shuffle on
  * the join key (no range/theta join, no per-row subquery), window
  * state is O(right columns) per key, and skewed keys split fine
  * because the frame is running (rank-style WindowGroupLimit doesn't
  * apply, but the window is a single forward pass per key).
  *
  * Equal-timestamp rule: right rows order before left rows at the
  * same (ts, key), so a right row AT the left timestamp is visible to
  * it; multiple right rows at one timestamp resolve by `tieCol`
  * (greatest wins) — deterministic, mirrored in the oracle.
  */
object AsOfJoin {

  /** @param left      left rows; must contain `key` and `ts`
    * @param right     right rows; must contain `key`, `ts`, and
    *                  `valueCols`; its column names must not collide
    *                  with left's (prefix them)
    * @param key       equi-join key column name (both sides)
    * @param ts        event-time column name (both sides)
    * @param tieCol    right column resolving equal-ts ties (greatest wins)
    * @param valueCols right columns to carry onto left rows
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
           tieCol: String, valueCols: Seq[String]): DataFrame = {
    val carried = (right.col(ts).as(s"__r_$ts") +: valueCols.map(c => col(c))).toSeq
    val r = right.select((col(key) +: col(ts) +: lit(0).as("__side") +: carried): _*)
    val l = left.withColumn("__side", lit(1))
    val combined = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side"), col(tieCol).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attached = (s"__r_$ts" +: valueCols.map(identity)).foldLeft(combined) {
      (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    attached.filter(col("__side") === 1).drop("__side")
  }
}
