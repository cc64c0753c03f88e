package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — the storage-layout op that
  * makes parquet min/max file skipping work on SEVERAL query columns
  * at once. A plain sort clusters one column perfectly and leaves the
  * others scattered across every file; interleaving the bits of all
  * ordering columns into one z-value and range-partitioning + sorting
  * on it gives every column locality proportional to its share of the
  * interleave — the standard Delta/Iceberg OPTIMIZE ZORDER technique,
  * reproduced on plain parquet.
  *
  * Normalization: each column is min/max scaled to `bits` levels via a
  * broadcast one-row aggregate (lazy — no driver-side action at plan
  * time, the division/upsertDim rule). Linear scaling is
  * skew-sensitive: heavily skewed columns get fewer effective levels;
  * the production refinement is quantile-based level boundaries
  * (approxQuantile), same interleave.
  *
  * Scale: one range exchange on the z-value (a single materialization
  * — no second derived branch, per the RangePartitioner-seed rule) +
  * per-partition sort; identical cost shape to a plain sorted write.
  */
object ZOrder {

  /** Bit-interleaved z-value of the rank-scaled `cols`. Column i
    * contributes bit j at output position j·k+i — 2-3 ordering columns
    * at 16 bits stay inside a 63-bit long (k·bits ≤ 63 enforced).
    */
  def zValue(scaled: Seq[Column], bits: Int): Column = {
    val k = scaled.length
    require(k >= 1 && k * bits <= 63, s"$k cols × $bits bits exceeds a long")
    val terms = for {
      (c, i) <- scaled.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(shiftright(c, j).bitwiseAND(lit(1L)), j * k + i)
    terms.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Write `df` as parquet clustered on the z-order of `cols`
    * (numeric columns), `numFiles` output files.
    */
  def writeZOrdered(df: DataFrame, path: String, cols: Seq[String],
                    numFiles: Int, bits: Int = 16): Unit = {
    val levels = (1L << bits) - 1
    // NaN sorts ABOVE +Inf in Spark's double ordering, so an unguarded
    // max() over a column with one NaN returns NaN, the range goes NaN,
    // and every row's component silently folds to level 0 (floor(double)
    // is already LONG and folds NaN to 0 without any ANSI throw —
    // clustering would quietly degrade on that whole dimension). Exclude
    // NaN from the stats so finite rows keep their full scale...
    val aggs = cols.flatMap { c =>
      val d = col(c).cast("double")
      Seq(min(when(!isnan(d), d)).as(s"__min_$c"),
        max(when(!isnan(d), d)).as(s"__max_$c"))
    }
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val scaled = cols.map { c =>
      val d = col(c).cast("double")
      val range = col(s"__max_$c") - col(s"__min_$c")
      // ...and pin NaN/null rows (and degenerate constant columns) to
      // level 0 explicitly — bad rows cluster together at the curve's
      // origin instead of poisoning the scaling of every other row
      coalesce(
        when(range === 0.0 || isnan(d), lit(0L)).otherwise(
          floor((d - col(s"__min_$c")) / range * levels)),
        lit(0L))
    }
    df.crossJoin(broadcast(stats))
      .withColumn("__z", zValue(scaled, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop((("__z" +: cols.flatMap(c => Seq(s"__min_$c", s"__max_$c")))): _*)
      .write.mode("overwrite").parquet(path)
  }
}
