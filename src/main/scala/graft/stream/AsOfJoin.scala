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
    // The whole right row travels as ONE struct so the window's
    // last(ignoreNulls) picks all attributes from the SAME matched
    // row — per-column lasts would splice a stale non-null value from
    // an older row next to a newer row's timestamp whenever a carried
    // column is null in the match. The tie column is also lifted to a
    // top-level __tie so ordering never resolves against a same-named
    // left column.
    val rStruct = struct(
      (right.col(ts).as(s"__r_$ts") +: valueCols.map(c => right.col(c).as(c))): _*)
    val r = right.select(col(key), col(ts), lit(0).as("__side"),
      right.col(tieCol).as("__tie"), rStruct.as("__r"))
    val l = left.withColumn("__side", lit(1))
    val combined = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side"), col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attached = combined
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
    val unpacked = (s"__r_$ts" +: valueCols).foldLeft(attached) {
      (df, c) => df.withColumn(c, col("__r").getField(c))
    }
    unpacked.filter(col("__side") === 1).drop("__side", "__tie", "__r")
  }
}
