package graft.vector

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Brute-force driver oracles for the round-9 vector kernels — the
  * "preferably both" half of the oracle-query-or-spec rule: the
  * DuckDB oracle proves cross-engine agreement, these prove the
  * SHAPE-optimized implementations equal the textbook O(n²) / naive
  * definitions they replace.
  */
class NewKernelsSpec extends SparkSpec {

  private lazy val vecs: Array[(Long, String, Array[Double])] =
    spark.read.parquet(s"$sfTiny/embeddings.parquet")
      .select(col("vec_id").cast("long"), col("label").cast("string"),
        col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getSeq[Float](2).toArray.map(_.toDouble)))

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc = acc + a(i) * b(i); i += 1 }
    acc
  }
  private def norm(a: Array[Double]): Double = math.sqrt(dot(a, a))
  private def r4(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0

  test("isotropy closed form equals the O(n²) pairwise definition") {
    val got = Projection.isotropy(spark, sfTiny)
      .collect().map(r => r.get(0).toString -> r.getDouble(2)).toMap
    vecs.groupBy(_._2).foreach { case (label, g) =>
      val us = g.map(v => { val n = norm(v._3); v._3.map(_ / n) })
      var s = 0.0; var cnt = 0L
      for (i <- us.indices; j <- us.indices if i != j) {
        s += dot(us(i), us(j)); cnt += 1
      }
      val brute = s / cnt
      assert(math.abs(got(label) - brute) < 1e-3,
        s"label $label: closed form ${got(label)} vs brute $brute")
    }
  }

  test("maxsim equals the brute-force late-interaction definition") {
    val q = vecs.find(_._1 == 0L).get._3
    def subs(v: Array[Double]) = (0 until 4).map(i => {
      val s = v.slice(i * 16, i * 16 + 16); val n = norm(s); s.map(_ / n)
    })
    val qs = subs(q)
    val scored = vecs.filter(_._1 != 0L).map { case (id, _, v) =>
      val ds = subs(v)
      val score = qs.map(qv => ds.map(dv => dot(dv, qv)).max).sum
      (id, score)
    }
    val bruteTop = scored.sortBy(t => (-t._2, t._1)).take(10)
    val got = VectorQueries.maxsim(spark, sfTiny)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(got.map(_._1).toSeq == bruteTop.map(_._1).toSeq,
      s"top-10 ids diverge: ${got.map(_._1).toSeq} vs ${bruteTop.map(_._1).toSeq}")
    got.zip(bruteTop).foreach { case ((_, g), (_, b)) =>
      // driver sum order (slot 0..3) matches the query's fixed-order
      // 4-term sum only up to associativity of the per-slot maxima —
      // both are exact doubles of identical dots, so r4 must agree
      assert(math.abs(g - r4(b)) < 2e-4, s"score $g vs ${r4(b)}")
    }
  }

  test("binaryQuant ranks by the reference sign-mask Hamming distance") {
    def masks(v: Array[Double]): (Long, Long) = {
      var lo = 0L; var hi = 0L
      (0 until 32).foreach(j => if (v(j) > 0) lo |= (1L << j))
      (0 until 32).foreach(j => if (v(32 + j) > 0) hi |= (1L << j))
      (lo, hi)
    }
    val byId = vecs.map(v => v._1 -> v._3).toMap
    val probes = vecs.map(_._1).filter(id => id % 100 == 0)
    val got = VectorQueries.binaryQuant(spark, sfTiny)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    probes.foreach { p =>
      val (plo, phi) = masks(byId(p))
      val hams = vecs.filter(_._1 != p).map { case (id, _, v) =>
        val (lo, hi) = masks(v)
        (id, java.lang.Long.bitCount(lo ^ plo) + java.lang.Long.bitCount(hi ^ phi))
      }
      val top = hams.sortBy(t => (t._2, t._1)).take(10)
      val avgHam = r4(top.map(_._2).sum.toDouble / top.size)
      assert(got(p) == avgHam, s"probe $p: avg_ham ${got(p)} vs reference $avgHam")
    }
  }
}
