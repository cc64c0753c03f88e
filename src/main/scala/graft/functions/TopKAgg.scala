package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Distributed exact top-k as a typed [[Aggregator]] — the UDAF
  * extension surface from SURVEY.md §2.7 (`Aggregator` +
  * `functions.udaf`), proven on a real gap: Spark has `max` (k=1) and
  * a full sort + limit (k=n) but no bounded-state per-GROUP top-k
  * aggregate.
  *
  * Scale: the buffer is a descending-sorted list capped at k, so state
  * is O(k) per group regardless of group size, `reduce` runs in the
  * map-side partial aggregate (each partition contributes at most k
  * values to the shuffle), and `merge` is an O(k) list merge — the
  * classic mergeable-summary shape, shuffle-volume-bounded at any
  * fact-table scale.
  *
  * Determinism: output is values only (no carried row identity), so
  * ties at the k-boundary produce identical output regardless of which
  * tied source row survived — safe for cross-engine hash comparison
  * with no rounding (pure selection, no float arithmetic).
  */
class TopKAgg(k: Int) extends Aggregator[Double, List[Double], Seq[Double]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: List[Double] = Nil

  // buf is sorted descending with length <= k
  private def insert(buf: List[Double], v: Double): List[Double] =
    if (buf.lengthCompare(k) >= 0 && v <= buf.last) buf
    else {
      val (hi, lo) = buf.span(_ >= v)
      (hi ::: v :: lo).take(k)
    }

  override def reduce(buf: List[Double], v: Double): List[Double] = insert(buf, v)

  override def merge(a: List[Double], b: List[Double]): List[Double] =
    b.foldLeft(a)(insert)

  override def finish(buf: List[Double]): Seq[Double] = buf

  override def bufferEncoder: Encoder[List[Double]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
}
