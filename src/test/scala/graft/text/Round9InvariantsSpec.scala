package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mathematical invariants of the round-9 oracle-gated queries — the
  * laws that must hold for ANY input, complementing the sf0.01
  * hash-compare (which pins one corpus): funnel monotonicity,
  * modularity bounds and edge identities, KS/TV/Spearman ranges,
  * farthest-point seed distinctness, BPE token-count contraction.
  */
class Round9InvariantsSpec extends SparkSpec {

  test("dedupChain funnel is monotone: n_near <= n_exact <= n_raw, retention in (0,1]") {
    val rows = TextQueries.dedupChain(spark, sfTiny).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (raw, ex, near) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(near <= ex && ex <= raw, s"funnel not monotone: $r")
      assert(raw > 0)
      val ret = r.getDouble(4)
      assert(ret > 0.0 - 1e-9 && ret <= 1.0 + 1e-9)
    }
  }

  test("modularity: intra + cut = m, Q in [-0.5, 1)") {
    val r = TextQueries.modularity(spark, sfTiny).collect().head
    val (m, intra, cut) = (r.getLong(1), r.getLong(2), r.getLong(3))
    assert(intra + cut == m)
    assert(m > 0 && intra >= 0 && cut >= 0)
    val q = r.getDouble(4)
    assert(q >= -0.5 && q < 1.0, s"Q out of range: $q")
  }

  test("ksDrift: D in [0,1], d_scaled <= n1*n2") {
    val rows = DocOps.ksDrift(spark, sfTiny).collect()
    assert(rows.nonEmpty)
    val nAll = rows.map(_.getLong(1)).sum
    rows.foreach { r =>
      val (n1, dScaled, ks) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(ks >= 0.0 && ks <= 1.0)
      assert(dScaled <= n1 * (nAll - n1))
    }
  }

  test("tvDrift: contributions nonnegative, sum (= TV) in [0,1]") {
    val rows = graft.olap.OlapStats.tvDrift(spark, sfTiny).collect()
    assert(rows.nonEmpty)
    val tv = rows.map(_.getDouble(3)).sum
    rows.foreach(r => assert(r.getDouble(3) >= 0.0))
    assert(tv >= 0.0 && tv <= 1.0 + 1e-9, s"TV out of range: $tv")
  }

  test("spearman: rho in [-1,1]; equal rankings of a column with itself give rho = 1") {
    val rows = TextQueries.spearman(spark, sfTiny).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9))
  }

  test("kppInit: 4 distinct seeds, selection distances positive after round 1") {
    val rows = graft.vector.VectorQueries.kppInit(spark, sfTiny)
      .orderBy("round").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(rows.map(_.getLong(1)).distinct.length == 4, "seeds must be distinct")
    assert(rows.head.getDouble(2) == 0.0)
    rows.tail.foreach(r => assert(r.getDouble(2) > 0.0))
  }

  test("bpeEncode: token totals strictly decrease across rounds by at most n_pair") {
    val rows = DocOps.bpeEncode(spark, sfTiny).orderBy("round").collect()
    assert(rows.length == 4)
    val afters = rows.map(_.getLong(4))
    afters.sliding(2).foreach { case Array(a, b) => assert(b < a) }
    // each merge removes one token per APPLIED occurrence, and applied
    // occurrences never exceed the counted (possibly overlapping) pairs
    rows.sliding(2).foreach { case Array(r1, r2) =>
      assert(r1.getLong(4) - r2.getLong(4) <= r2.getLong(3))
    }
  }

  test("datasetCard: volumes positive, mean_quality in [0,1], top_lang among langs") {
    val rows = TextQueries.datasetCard(spark, sfTiny).collect()
    assert(rows.nonEmpty)
    val langs = graft.schema.Tables.documents(spark, sfTiny)
      .select(collect_set(col("lang"))).collect().head.getSeq[String](0).toSet
    rows.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) > 0)
      assert(langs.contains(r.getString(4)))
      val mq = r.getDouble(7)
      assert(mq >= 0.0 && mq <= 1.0)
    }
  }
}
