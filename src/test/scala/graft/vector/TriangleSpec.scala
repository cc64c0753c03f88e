package graft.vector

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Proves the oriented two-hop triangle join ≡ brute-force triangle
  * enumeration — the property the sf0.01 oracle can't isolate (there
  * the edge list and the count come from the same SQL shape on both
  * engines, so a systematic orientation bug would cancel out).
  */
class TriangleSpec extends SparkSpec {

  private def bruteForce(edges: Set[(Long, Long)]): Map[Long, (Long, Long)] = {
    val und = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nodes = und.keySet.toSeq.sorted
    val tris = for {
      a <- nodes; b <- und(a).toSeq.sorted if b > a
      c <- und(b).toSeq.sorted if c > b && und(a).contains(c)
    } yield (a, b, c)
    val triCount = tris.flatMap { case (a, b, c) => Seq(a, b, c) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    nodes.flatMap { n =>
      val d = und(n).size.toLong
      triCount.get(n).map(t => n -> (d, t))
    }.toMap
  }

  private def viaKernel(edges: Set[(Long, Long)]): Map[Long, (Long, Long)] = {
    import spark.implicits._
    val df = edges.toSeq.toDF("u", "w")
    VectorQueries.localTriangleStats(df)
      .select("vec_id", "degree", "n_tri")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
  }

  test("K4 plus pendant: each triangle counted exactly once per node") {
    val k4 = Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
    val got = viaKernel(k4)
    // every K4 node sits in C(3,2)=3 triangles; the pendant in none
    assert(got == Map(1L -> (3L, 3L), 2L -> (3L, 3L), 3L -> (3L, 3L), 4L -> (4L, 3L)))
  }

  test("oriented join matches brute force on a deterministic random graph") {
    // LCG-driven G(n, p≈0.2) on 24 nodes — dense enough for shared and
    // overlapping triangles, no RNG seed sensitivity
    var state = 42L
    def next(): Long = { state = (state * 6364136223846793005L + 1442695040888963407L); state }
    val edges = (for {
      a <- 1L to 24L; b <- (a + 1) to 24L
      if java.lang.Long.remainderUnsigned(next(), 5) == 0L
    } yield (a, b)).toSet
    val expected = bruteForce(edges)
    assert(viaKernel(edges) == expected, s"mismatch on ${edges.size}-edge graph")
  }

  test("degree-ordered orientation is count-equivalent to id orientation") {
    import spark.implicits._
    // the same G(n, p≈0.2) fixture plus a hub (node 30 joined to
    // everything — the skew degreeOrient exists for) so ties AND
    // extreme degree spread are both exercised
    var state = 99L
    def next(): Long = { state = (state * 6364136223846793005L + 1442695040888963407L); state }
    val base = (for {
      a <- 1L to 20L; b <- (a + 1) to 20L
      if java.lang.Long.remainderUnsigned(next(), 5) == 0L
    } yield (a, b)).toSet
    val edges = base ++ (1L to 20L).map(n => (n, 30L))
    val df = edges.toSeq.toDF("u", "w")
    val reoriented = VectorQueries.degreeOrient(df)
    // the reorientation is a bijection on undirected edges...
    val undirected = (d: org.apache.spark.sql.DataFrame) => d
      .select(least(col("u"), col("w")).as("a"), greatest(col("u"), col("w")).as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(undirected(reoriented) == undirected(df))
    // ...every oriented edge points low-degree → high-degree...
    val deg = edges.toSeq.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    reoriented.collect().foreach { r =>
      val (u, w) = (r.getLong(0), r.getLong(1))
      assert(deg(u) < deg(w) || (deg(u) == deg(w) && u < w),
        s"edge $u→$w not degree-ordered (deg ${deg(u)} vs ${deg(w)})")
    }
    // ...and the two-hop kernel returns identical per-node stats
    val viaId = VectorQueries.localTriangleStats(df)
      .select("vec_id", "degree", "n_tri")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaDeg = VectorQueries.localTriangleStats(reoriented)
      .select("vec_id", "degree", "n_tri")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaDeg == viaId)
    assert(viaId.nonEmpty, "vacuous: fixture produced no triangles")
  }

  test("triangle-free graph yields empty stats") {
    // a path and a star: no triangles anywhere
    val tf = Set((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (10L, 12L), (10L, 13L))
    assert(viaKernel(tf).isEmpty)
  }
}
