package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sampling for training-data pipelines: hash-based, so samples are
  * DETERMINISTIC functions of row content — reproducible across runs,
  * partitionings, and cluster sizes, unlike `df.sample`/`sampleBy`
  * whose RNG draws depend on partition layout. This is the standard
  * trick for train/validation splits at corpus scale: split membership
  * must never change when the pipeline is re-run or repartitioned.
  */
object Sampling {

  private val Buckets = 1000000

  /** Per-row hash in [0, 1) derived from the id columns PLUS a
    * purpose salt. The salt decorrelates the operations: without it,
    * sampling then splitting on the same id columns is degenerate
    * (every sampled row has h < sampleFrac, so it all lands in
    * train and val/test come out empty).
    */
  private def hashFrac(cols: Seq[String], salt: String) =
    (pmod(xxhash64((lit(salt) +: cols.map(col)): _*), lit(Buckets.toLong))
      .cast("double") / Buckets)

  /** Keep ~fraction of rows, chosen by content hash of `idCols`. */
  def deterministicSample(df: DataFrame, fraction: Double,
                          idCols: Seq[String],
                          salt: String = "sample"): DataFrame =
    df.filter(hashFrac(idCols, salt) < fraction)

  /** Stratified sample: per-stratum fractions (absent strata keep
    * nothing). One scan, no shuffle — the filter is a pure per-row
    * predicate.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String,
                       fractions: Map[String, Double],
                       idCols: Seq[String],
                       salt: String = "stratified"): DataFrame = {
    val frac = fractions.foldLeft(lit(0.0)) { case (acc, (k, f)) =>
      when(col(stratumCol) === k, lit(f)).otherwise(acc)
    }
    df.filter(hashFrac(idCols, salt) < frac)
  }

  /** Disjoint train/validation/test split by content hash —
    * reproducible and leak-free (a row's split never changes).
    */
  def split(df: DataFrame, trainFrac: Double, valFrac: Double,
            idCols: Seq[String],
            salt: String = "split"): (DataFrame, DataFrame, DataFrame) = {
    val h = hashFrac(idCols, salt)
    (df.filter(h < trainFrac),
      df.filter(h >= trainFrac && h < trainFrac + valFrac),
      df.filter(h >= trainFrac + valFrac))
  }
}
