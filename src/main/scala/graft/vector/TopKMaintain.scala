package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental top-k similarity maintenance — the vector-search member
  * of the engine's incremental trio (dedup: `q_delta_dedup`;
  * aggregates: [[graft.etl.AggMaintain]]): a persisted per-probe
  * top-k result set is refreshed against a DELTA batch of new corpus
  * vectors with work proportional to probes × delta, never a corpus
  * rescan (the interactive-session shape of EDBT 2020's incremental
  * top-k similarity search).
  *
  * Correctness model: top-k under a total order (sim desc, vec_id) is
  * a mergeable summary — merge = union + re-rank + truncate, so
  * `topk(full) = truncate(merge(topk(old), topk(delta)))` exactly,
  * PROVIDED the delta never removes or mutates old vectors
  * (insert-only, same contract as AggMaintain). The tie-break makes
  * both sides deterministic, so refresh ≡ recompute row-for-row.
  *
  * Scale: the old snapshot enters at k·P cardinality (tiny); only the
  * delta is scored — one broadcast of the probe set over the delta
  * batch, a per-probe rank over ≤ (k + |delta|) candidates, and a
  * final per-probe re-rank over ≤ 2k rows.
  */
object TopKMaintain {

  /** @param snapshot prior (probe_id, vec_id, sim) top-k rows
    * @param probes   (probe_id, pv, pnrm) — the tracked probe set
    * @param delta    new corpus vectors (vec_id, v, nrm), insert-only
    */
  def refreshTopK(snapshot: DataFrame, probes: DataFrame, delta: DataFrame,
                  k: Int): DataFrame = {
    val byProbe = Window.partitionBy("probe_id")
      .orderBy(col("sim").desc, col("vec_id"))
    val deltaScored = delta.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("sim",
        VectorFns.cosineStaged(col("v"), col("pv"), col("nrm"), col("pnrm")))
      .select(col("probe_id"), col("vec_id"), col("sim"))
    snapshot.select("probe_id", "vec_id", "sim")
      .unionByName(deltaScored)
      .withColumn("rk", row_number().over(byProbe))
      .filter(col("rk") <= k)
      .select("probe_id", "vec_id", "sim")
  }
}
