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
    val aggs = cols.flatMap(c => Seq(
      min(col(c)).cast("double").as(s"__min_$c"),
      max(col(c)).cast("double").as(s"__max_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val scaled = cols.map { c =>
      val range = col(s"__max_$c") - col(s"__min_$c")
      // degenerate (constant) columns scale to level 0; try_cast, not
      // cast: a NaN in the column makes max/range NaN and ANSI mode
      // would throw on NaN→long for EVERY row — null z-components
      // cluster the bad rows together instead (CLAUDE.md ANSI rule)
      coalesce(
        when(range === 0.0, lit(0L)).otherwise(
          floor((col(c).cast("double") - col(s"__min_$c")) / range * levels)
            .try_cast("long")),
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
