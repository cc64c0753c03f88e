package graft

import org.apache.spark.sql.functions._

/** Mathematical invariants of the round-11 oracle-gated queries —
  * laws that hold for ANY input, complementing the sf0.01
  * hash-compare: OLS agreement with the built-in regressor,
  * Theil–Sen quantile ordering and pair counting, U-shaped
  * attribution's unit-credit conservation, hash-sample
  * partition-layout determinism, CCNet bucket partitioning, and the
  * filtered-search identity (post-filter hits ≡ survivors).
  */
class Round11InvariantsSpec extends SparkSpec {

  test("olsTrend matches regr_slope/regr_intercept within 1e-4") {
    import graft.schema.Tables
    val li = Tables.lineitem(spark, sfTiny)
      .withColumn("cents",
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * 100.0 + 0.5).cast("long"))
      .withColumn("m",
        ((year(col("l_shipdate")) - 1992) * 12 + month(col("l_shipdate")) - 1)
          .cast("long"))
    val bm = li.join(Tables.part(spark, sfTiny),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"), col("m"))
      .agg(sum(col("cents")).as("y"))
    // the float twin this query deliberately does NOT use (running
    // sums are partition-order-dependent) — but on one small
    // partition layout it must agree to well under round4 precision
    val ref = bm.groupBy("brand")
      .agg((expr("regr_slope(y, m)") / 100.0).as("s_ref"),
        (expr("regr_intercept(y, m)") / 100.0).as("i_ref"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val got = graft.olap.Analytics.olsTrend(spark, sfTiny).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (s, i) = (ref(r.getString(0))._1, ref(r.getString(0))._2)
      assert(math.abs(r.getDouble(2) - s) <= 1e-6 * math.max(1.0, math.abs(s)),
        s"slope mismatch: $r vs $s")
      assert(math.abs(r.getDouble(3) - i) <= 1e-6 * math.max(1.0, math.abs(i)),
        s"intercept mismatch: $r vs $i")
    }
  }

  test("theilSen: quantiles ordered, n_pairs = months choose 2") {
    val r = graft.olap.Analytics.theilSen(spark, sfTiny).collect().head
    val nMonths = graft.schema.Tables.orders(spark, sfTiny)
      .select(date_trunc("month", col("o_orderdate"))).distinct().count()
    assert(r.getLong(0) == nMonths * (nMonths - 1) / 2)
    assert(r.getDouble(1) <= r.getDouble(2) && r.getDouble(2) <= r.getDouble(3))
  }

  test("multiTouch conserves one credit per converting user with touches") {
    val rows = graft.stream.EventQueries.multiTouch(spark, sfTiny).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getDouble(2)).sum
    // every touched converter's weights sum to exactly 1 before the
    // per-touch round6 collapse; the drift bound is touches × 5e-7
    val nTouches = rows.map(_.getLong(1)).sum
    assert(total > 0)
    assert(math.abs(total - math.round(total)) <= nTouches * 5e-7 + 1e-4,
      s"credit sum $total not near-integer")
  }

  test("hashSample is internally consistent and totals match an ungrouped recount") {
    val a = graft.text.TextAnalytics.hashSample(spark, sfTiny).collect()
    assert(a.nonEmpty)
    a.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1)) // n_sampled <= n_docs
      val rate = r.getDouble(3)
      assert(rate >= 0.0 && rate <= 1.0)
    }
    // group-by-free recount over a different (repartitioned) layout:
    // content-keyed membership cannot depend on either
    val total = graft.schema.Tables.documents(spark, sfTiny)
      .repartition(7)
      .filter(graft.functions.TextHashes.polyHash(col("text")) % 100 < 10)
      .count()
    assert(a.map(_.getLong(2)).sum == total)
    assert(a.map(_.getLong(1)).sum ==
      graft.schema.Tables.documents(spark, sfTiny).count())
  }

  test("ccnetBuckets partitions each language exactly") {
    val rows = graft.text.TextAnalytics.ccnetBuckets(spark, sfTiny).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => Set("head", "middle", "tail")(r.getString(1))))
    val byLang = rows.groupBy(_.getString(0)).map { case (l, rs) =>
      l -> rs.map(_.getLong(2)).sum
    }
    val docs = graft.schema.Tables.documents(spark, sfTiny)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byLang.foreach { case (l, n) => assert(n == docs(l), s"lang $l: $n != ${docs(l)}") }
    // head scores at or below tail within every complete language
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val m = rs.map(r => r.getString(1) -> r.getDouble(3)).toMap
      for (h <- m.get("head"); t <- m.get("tail")) assert(h <= t)
    }
  }

  test("filteredKnn: post-filter hits equal survivors (survivor identity)") {
    val rows = graft.vector.VectorQueries.filteredKnn(spark, sfTiny).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nPost, hits, recall) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      // an even-label vector in the global top-k ranks at least as
      // high among even-label candidates, so every survivor is a hit
      assert(hits == nPost, s"survivor identity violated: $r")
      assert(nPost <= 10)
      assert(math.abs(recall - hits / 10.0) < 1e-9)
    }
  }

  test("listAgg emits sorted, count-consistent segment lists") {
    val rows = graft.olap.OlapMore.listAgg(spark, sfTiny).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val parts = r.getString(2).split(",")
      assert(parts.length == r.getLong(1))
      assert(parts.sameElements(parts.sorted))
    }
  }

  test("sq8Recall: recall in [0,1], hits bounded by k") {
    val rows = graft.vector.VectorQueries.sq8Recall(spark, sfTiny).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) <= 10)
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
    }
  }
}
