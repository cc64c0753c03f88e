package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Structural invariants of the DocOps curation operators — laws the
  * per-value DuckDB hash compare can't state (it proves equality, not
  * WHY the numbers are lawful).
  */
class DocOpsSpec extends SparkSpec {

  test("cms_est never underestimates (CMS guarantee) and is exact-consistent") {
    val rows = DocOps.cmsEst(spark, sfTiny).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("n_exact")
      val est = r.getAs[Long]("n_est")
      assert(est >= exact, s"CMS underestimated ${r.getString(0)}: $est < $exact")
      assert(r.getAs[Long]("overcount") == est - exact)
    }
  }

  test("cms cells are a mergeable summary: cells(A) + cells(B) = cells(A union B)") {
    val docs = graft.schema.Tables.documents(spark, sfTiny)
    val whole = DocOps.cmsCells(docs)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val even = DocOps.cmsCells(docs.filter(col("doc_id") % 2 === 0)).collect()
    val odd = DocOps.cmsCells(docs.filter(col("doc_id") % 2 === 1)).collect()
    val merged = (even ++ odd)
      .groupBy(r => (r.getInt(0), r.getLong(1)))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(merged == whole, "per-half sketches did not fold to the whole-corpus sketch")
  }

  test("dict_encode never inflates: encoded <= raw, and totals are consistent") {
    val r = DocOps.dictEncode(spark, sfTiny).collect().head
    assert(r.getAs[Long]("encoded_bytes") <= r.getAs[Long]("raw_bytes"))
    assert(r.getAs[Long]("n_vocab") <= r.getAs[Long]("n_tokens"))
    val nTokens = graft.schema.Tables.documents(spark, sfTiny)
      .select(explode(TextFns.tokens(col("text"))))
      .count()
    assert(r.getAs[Long]("n_tokens") == nTokens)
  }

  test("segment_dedup keeps exactly one winner per distinct segment") {
    val agg = DocOps.segmentDedup(spark, sfTiny)
      .agg(sum(col("n_kept")).as("kept"), sum(col("n_segments")).as("segs"))
      .collect().head
    val kept = agg.getAs[Long]("kept")
    val segs = agg.getAs[Long]("segs")
    assert(kept >= 1 && kept <= segs)
    // independent recount: total segments = sum of per-doc ceil(n/10)
    val expSegs = graft.schema.Tables.documents(spark, sfTiny)
      .select(TextFns.tokens(col("text")).as("ts"))
      .select(expr("greatest((size(ts) + 9) DIV 10, 1)").as("n"))
      .agg(sum(col("n"))).collect().head.getLong(0)
    assert(segs == expSegs)
  }

  test("gopher_rules pass counts match a brute-force recount") {
    val stop = TextFns.stopwords.toSet
    val docs = graft.schema.Tables.documents(spark, sfTiny)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val brute = docs.groupBy(_._1).map { case (src, ds) =>
      val passes = ds.count { case (_, text) =>
        val ts = text.toLowerCase.split(" ").filter(_.nonEmpty)
        val n = ts.length.toLong
        val letters = ts.map(_.length.toLong).sum
        val stops = ts.count(stop.contains).toLong
        val topc = if (ts.isEmpty) 0L else ts.groupBy(identity).values.map(_.length).max.toLong
        n >= 30 && n <= 90 &&
          letters >= 4 * n && letters <= 10 * n &&
          stops >= 2 && topc * 8 <= n
      }
      src -> passes.toLong
    }
    val got = DocOps.gopherRules(spark, sfTiny).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_pass")).toMap
    assert(got == brute, s"pass counts diverge: $got vs $brute")
  }

  test("novelty attributes every distinct gram to exactly one source") {
    val total = DocOps.novelty(spark, sfTiny)
      .agg(sum(col("n_novel"))).collect().head.getLong(0)
    val distinctGrams = graft.schema.Tables.documents(spark, sfTiny)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("ts"))
      .select(explode(array_distinct(
        graft.functions.TextHashes.ngramHashes(col("ts"), 3))).as("g"))
      .select(countDistinct(col("g"))).collect().head.getLong(0)
    assert(total == distinctGrams,
      s"sum of per-source novel grams $total != global distinct grams $distinctGrams")
  }

  test("pack_audit hierarchical prefix sum equals the flat-window packing") {
    // the scale claim is that block partials + offset window + local
    // windows compute the SAME cumulative sums as the naive
    // single-partition running sum — recompute flat and compare
    import org.apache.spark.sql.expressions.Window
    val cap = 512L
    val flat = graft.schema.Tables.documents(spark, sfTiny)
      .select(col("doc_id"), col("source"),
        size(TextFns.tokens(col("text"))).cast("long").as("n_tok"))
      .withColumn("cum", sum(col("n_tok")).over(
        Window.partitionBy("source").orderBy("doc_id")))
      .withColumn("extra",
        when(col("n_tok") === 0, lit(0L))
          .otherwise(expr(s"(cum - 1) DIV $cap - (cum - n_tok) DIV $cap")))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("total_tokens"),
        sum(when(col("extra") > 0, 1L).otherwise(0L)).as("n_straddle"),
        sum(col("extra")).as("frag_extra"))
      .withColumn("n_bins", expr(s"(total_tokens + ${cap - 1}) DIV $cap"))
      .select("source", "n_docs", "total_tokens", "n_bins", "n_straddle", "frag_extra")
      .orderBy("source").collect()
    val hier = DocOps.packAudit(spark, sfTiny).collect()
    assert(hier.nonEmpty && hier.sameElements(flat),
      "hierarchical packing disagrees with the flat-window reference")
  }

  test("winnow_fp pairs are oriented and meet the share threshold") {
    val rows = DocOps.winnowFp(spark, sfTiny).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      assert(r.getAs[Long]("n_shared") >= 2L)
    }
  }
}
