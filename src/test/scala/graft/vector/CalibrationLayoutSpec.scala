package graft.vector

import graft.SparkSpec

/** Layout-stress determinism pin for the `knnVotes` kernel (the shared
  * base of q_calibration and q_vote_auc) — round-11's only driver-gate
  * red row was a q_calibration hash flip that no local re-run
  * reproduced. The vote outcome set (p_id, p_label, pred, v_max,
  * v_tot) must be byte-identical under every execution layout Spark
  * can legally pick: shuffle-partition counts, AQE on/off. If this
  * suite ever flakes, the kernel has a real nondeterminism, not an
  * environment ghost.
  */
class CalibrationLayoutSpec extends SparkSpec {

  private def votesUnder(shufflePartitions: String, aqe: String): Seq[String] = {
    val prevSp = spark.conf.get("spark.sql.shuffle.partitions")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", shufflePartitions)
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      VectorQueries.knnVotes(spark, sfTiny)
        .collect()
        .map(r => Seq(r.get(0), r.get(1), r.get(2), r.get(3), r.get(4)).mkString("|"))
        .sorted
        .toSeq
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevSp)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("knnVotes outcome set is invariant under layout permutations") {
    val base = votesUnder("2", "true")
    assert(base.nonEmpty, "vacuous: no probes voted at sf0.001")
    for (sp <- Seq("3", "7", "32"); aqe <- Seq("true", "false")) {
      val got = votesUnder(sp, aqe)
      assert(got == base,
        s"vote set changed under shuffle.partitions=$sp aqe=$aqe: " +
          s"${got.diff(base).take(3)} vs ${base.diff(got).take(3)}")
    }
  }

  test("calibration bins are invariant under layout permutations") {
    def binsUnder(sp: String): Seq[String] = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      try {
        spark.conf.set("spark.sql.shuffle.partitions", sp)
        VectorQueries.calibration(spark, sfTiny)
          .collect().map(_.mkString("|")).sorted.toSeq
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    val base = binsUnder("2")
    assert(base.nonEmpty)
    assert(binsUnder("32") == base)
  }
}
