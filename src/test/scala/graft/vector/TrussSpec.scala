package graft.vector

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the iterative k-truss peel ([[VectorQueries.trussPeel]]) and
  * the per-edge support census ([[VectorQueries.edgeSupport]]) against
  * brute-force reference implementations — the cascade behavior (one
  * deletion dropping a neighbor edge below threshold next round) is
  * exactly what the single-pass oracle census cannot gate.
  */
class TrussSpec extends SparkSpec {

  private def bruteSupport(edges: Set[(Long, Long)]): Map[(Long, Long), Long] = {
    val und = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    edges.map { case (a, b) =>
      (a, b) -> (und(a) & und(b)).size.toLong
    }.toMap
  }

  private def brutePeel(edges: Set[(Long, Long)], k: Int): Set[(Long, Long)] = {
    var cur = edges
    var stable = false
    while (!stable) {
      val sup = bruteSupport(cur)
      val next = cur.filter(e => sup(e) >= k - 2)
      if (next == cur) stable = true else cur = next
    }
    cur
  }

  private def toDf(edges: Set[(Long, Long)]) = {
    import spark.implicits._
    edges.toSeq.toDF("u", "w")
  }

  private def collectEdges(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("u", "w").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("edgeSupport matches brute-force common-neighbor counts (K4 + pendant)") {
    val k4 = Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
    val got = VectorQueries.edgeSupport(toDf(k4))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == bruteSupport(k4))
  }

  test("3-truss peel cascades: bridge triangle chain collapses fully") {
    // two triangles sharing no edge, linked by a bridge: the bridge
    // has support 0 and goes first; both triangles survive a 3-truss
    // (support >= 1) — then k=4 peels EVERYTHING (no edge has
    // support >= 2), exercising the full cascade.
    val g = Set((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L), (4L, 6L), (5L, 6L))
    val t3 = collectEdges(VectorQueries.trussPeel(toDf(g), 3))
    assert(t3 == brutePeel(g, 3))
    assert(t3 == g - ((3L, 4L)))
    val t4 = collectEdges(VectorQueries.trussPeel(toDf(g), 4))
    assert(t4.isEmpty && brutePeel(g, 4).isEmpty)
  }

  test("peel matches brute force across k on a deterministic random graph") {
    var state = 7L
    def next(): Long = { state = (state * 6364136223846793005L + 1442695040888963407L); state }
    val edges = (for {
      a <- 1L to 18L; b <- (a + 1) to 18L
      if java.lang.Long.remainderUnsigned(next(), 3) == 0L
    } yield (a, b)).toSet
    for (k <- 3 to 5) {
      val got = collectEdges(VectorQueries.trussPeel(toDf(edges), k))
      assert(got == brutePeel(edges, k), s"k=$k mismatch on ${edges.size}-edge graph")
    }
  }

  test("peel leaves no superseded checkpoint blocks persisted") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val g = Set((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L), (4L, 6L), (5L, 6L))
    val out = VectorQueries.trussPeel(toDf(g), 3)
    out.count()
    val after = spark.sparkContext.getPersistentRDDs.keySet -- before
    // only the FINAL round's blocks may remain (the result reads from
    // them); every superseded round must have been freed
    assert(after.size <= 2, s"leaked checkpoint blocks: $after")
  }
}
