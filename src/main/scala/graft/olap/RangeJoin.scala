package graft.olap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — the second time-shaped join Spark SQL
  * lacks natively, next to [[graft.stream.AsOfJoin]] (build brief:
  * compose existing ops when semantics allow; this is the composition
  * path).
  *
  * Matches each left POINT row to every right INTERVAL row of the
  * same key with `start <= pt <= end`. The naive form — equi-join on
  * key plus a theta filter — degenerates at scale: a hot key's points
  * × intervals all meet in one task regardless of their positions.
  *
  * Scale-safe formulation (the standard bucketed interval join, cf.
  * Spark's own optimized range-join work in Delta/Photon): quantize
  * the axis into `bucket`-wide cells; a point lives in exactly ONE
  * cell, an interval replicates to each cell it overlaps, and the
  * join becomes an EQUI-join on (key, cell) + exact refine. Because a
  * point has one cell, a (point, interval) pair can meet only once —
  * no dedup pass. Shuffle volume is points + intervals × (span/bucket
  * + 1); `bucket` is the dial between interval duplication (small
  * buckets) and residual in-cell fan-out (large buckets) — set it
  * near the median interval span. The equi-key is fine-grained, so
  * AQE's skew split applies where a plain theta join could not.
  */
object RangeJoin {

  /** @param left   point side; must contain `key` and `pt`
    * @param right  interval side; must contain `key`, `start`, `end`
    *               (inclusive ends); other column names must not
    *               collide with left's
    * @param bucket cell width on the axis (same unit as `pt`, after
    *               long cast; timestamps cast to epoch seconds)
    */
  def pointInInterval(left: DataFrame, right: DataFrame, key: String,
                      pt: String, start: String, end: String,
                      bucket: Long): DataFrame = {
    require(bucket > 0, s"bucket width must be positive, got $bucket")
    val l = left.withColumn("__cell", floor(col(pt).cast("long") / bucket))
    val r = right
      .filter(col(end) >= col(start)) // drop degenerate intervals
      .withColumn("__cell", explode(sequence(
        floor(col(start).cast("long") / bucket),
        floor(col(end).cast("long") / bucket))))
    l.join(r, l(key) === r(key) && l("__cell") === r("__cell"))
      .filter(col(pt) >= col(start) && col(pt) <= col(end))
      .drop(r(key)).drop("__cell")
  }
}
