package graft.vector

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval-quality audit for the pruned search paths: on data WITH
  * cluster structure, sign-LSH bucket pruning must recover most of
  * the exact top-k. The parquet fixture can't carry this test — its
  * embeddings are near-random (max pairwise cosine ≈ 0.37), where any
  * bucketing slices arbitrarily and recall is legitimately ~0 (the
  * oracle queries pin CORRECTNESS of the pruned plans there; this
  * spec pins their USEFULNESS where structure exists, which is the
  * regime real embedding corpora live in).
  */
class VectorRecallSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private val k = 10

  /** 8 tight clusters of 25 vectors around seeded unit centers. */
  private lazy val clustered: DataFrame = {
    val rnd = new scala.util.Random(7)
    def unit(): Array[Double] = {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val centers = Seq.fill(8)(unit())
    val rows = for {
      c <- centers.indices
      i <- 0 until 25
    } yield (c * 25L + i, centers(c).map(_ + 0.05 * rnd.nextGaussian()).toSeq)
    rows.toDF("vec_id", "v")
      .withColumn("nrm", VectorFns.norm(col("v")))
  }

  private def topIds(scored: DataFrame): Set[Long] =
    scored.orderBy(col("sim").desc, col("vec_id")).limit(k)
      .select("vec_id").as[Long].collect().toSet

  test("sign-LSH bucket search recovers the exact top-k on clustered vectors") {
    val probe = clustered.filter(col("vec_id") === 0)
      .select(col("v").as("pv"), col("nrm").as("pnrm"))
    val rest = clustered.filter(col("vec_id") =!= 0)
    def score(df: DataFrame): DataFrame = df.crossJoin(broadcast(probe))
      .withColumn("sim",
        VectorFns.cosineStaged(col("v"), col("pv"), col("nrm"), col("pnrm")))

    val exact = topIds(score(rest))

    val bucketed = clustered
      .withColumn("bucket", VectorFns.signBucket(col("v"), 6, 2))
    val pbucket = bucketed.filter(col("vec_id") === 0)
      .select(col("bucket").as("pb"))
    val candidates = bucketed.filter(col("vec_id") =!= 0)
      .join(broadcast(pbucket), col("bucket") === col("pb"))
    val nCandidates = candidates.count()
    val approx = topIds(score(candidates))

    val recall = (exact & approx).size.toDouble / k
    // tight clusters: the probe's cluster shares its orthant, so the
    // bucket holds the true neighbors; 0.9 floor leaves room for the
    // few boundary vectors the hyperplanes clip
    assert(recall >= 0.9, s"recall $recall (exact $exact vs approx $approx)")
    // and the bucket actually pruned — searching everything would
    // make the recall trivial
    assert(nCandidates < 100, s"bucket pruned nothing: $nCandidates of 199")
  }

  test("multi-cell IVF probing recovers at least the single-cell recall") {
    // the nprobe knob's contract on the parquet fixture: probing the
    // runner-up cells can only add candidates near the probe's cell
    // boundary, so recall@k vs exact kNN must be ≥ the nprobe=1 path
    def ids(df: DataFrame): Set[Long] =
      df.select("vec_id").collect().map(_.getLong(0)).toSet
    val exact = ids(VectorQueries.knn(spark, sfTiny))
    val oneCell = ids(VectorQueries.ivfSearch(spark, sfTiny))
    val multiCell = ids(VectorQueries.ivfSearchNprobe(spark, sfTiny))
    assert(exact.size == k && multiCell.nonEmpty, "vacuous fixture")
    val recall1 = (exact & oneCell).size
    val recallN = (exact & multiCell).size
    assert(recallN >= recall1,
      s"nprobe expansion lost recall: $recallN < $recall1")
  }

  test("recall curve is monotone in nprobe and consistent with the serve paths") {
    // q_ivf_recall_curve's contract: nested candidate sets make
    // recall non-decreasing as nprobe grows, and the curve's level-1
    // row must agree with what ivfSearch-style single-cell serving
    // actually achieves (same cells, same rounded election)
    val rows = VectorQueries.ivfRecallCurve(spark, sfTiny)
      .orderBy("nprobe")
      .select("nprobe", "n_cands", "recall")
      .collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3), "curve rows")
    val recalls = rows.map(_.getDouble(2)).toSeq
    assert(recalls == recalls.sorted,
      s"recall not monotone in nprobe: $recalls")
    val cands = rows.map(_.getLong(1)).toSeq
    assert(cands == cands.sorted && cands.distinct == cands,
      s"candidate counts must strictly grow with nprobe: $cands")
  }

  test("graph-ANN beam curve: wider beams visit more and recall does not regress") {
    // q_graph_ann's operating contract on the fixture: the beam width
    // is the cost knob (visited = scored candidates, non-decreasing in
    // width) and recall rides it. Formal monotonicity of best-first
    // beams is not guaranteed in general (a wider beam can wander), so
    // like the nprobe curve above this pins the FIXTURE's behavior —
    // which is what the oracle gate replays too.
    val rows = VectorQueries.graphAnn(spark, sfTiny)
      .orderBy("beam")
      .select("beam", "n_visited", "hits", "recall")
      .collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 4, 16, 64), "curve rows")
    val visited = rows.map(_.getLong(1)).toSeq
    assert(visited == visited.sorted,
      s"visited counts must be non-decreasing in beam width: $visited")
    val recalls = rows.map(_.getDouble(3)).toSeq
    assert(recalls == recalls.sorted,
      s"recall not monotone in beam width on the fixture: $recalls")
    assert(recalls.last > 0.0, "vacuous: widest beam found nothing")
  }
}
