package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge cases for the round-6 corpus operators — the properties the
  * sf0.01 oracle gate can't see: the Misra-Gries frequency guarantee
  * under adversarial interleaving, chunk-plan coverage invariants, and
  * exact budget conservation in the apportionment.
  */
class CorpusOpsSpec extends SparkSpec {

  // ---------- Misra-Gries candidate guarantee ----------

  test("mgCandidates keeps every item with count > n/(m+1)") {
    // adversarial stream: heavy items interleaved inside a long tail of
    // singletons that keeps forcing the decrement step
    val heavy = Seq.fill(300)("hh1") ++ Seq.fill(150)("hh2")
    val tail = (1 to 2000).map(i => s"t$i")
    val stream = (heavy ++ tail).zipWithIndex
      .sortBy { case (_, i) => (i * 2654435761L) % 4096 } // deterministic shuffle
      .map(_._1)
    val m = 20
    val n = stream.size
    val counts = stream.groupBy(identity).view.mapValues(_.size)
    val cands = CorpusOps.mgCandidates(stream.iterator, m).toSet
    val mustKeep = counts.filter { case (_, c) => c > n / (m + 1) }.keys
    assert(mustKeep.forall(cands.contains),
      s"MG dropped a guaranteed-heavy item: ${mustKeep.filterNot(cands.contains)}")
    assert(cands.size <= m, s"MG state exceeded capacity: ${cands.size} > $m")
  }

  test("mgCandidates is bounded and total on degenerate streams") {
    assert(CorpusOps.mgCandidates(Iterator.empty, 4).isEmpty)
    val uniform = CorpusOps.mgCandidates((1 to 100).iterator.map(_.toString), 4)
    assert(uniform.size <= 4)
    val single = CorpusOps.mgCandidates(Iterator.fill(50)("x"), 4).toSeq
    assert(single == Seq("x"))
  }

  test("mgMerge caps at capacity and keeps combined-heavy items") {
    val a = CorpusOps.mgSummary(
      (Seq.fill(80)("x") ++ (1 to 300).map(i => s"a$i")).iterator, 10).toMap
    val b = CorpusOps.mgSummary(
      (Seq.fill(90)("x") ++ (1 to 300).map(i => s"b$i")).iterator, 10).toMap
    val merged = CorpusOps.mgMerge(a, b, 10)
    assert(merged.size <= 10)
    // x has 170/760 total (> n/(m+1) = 69) — must survive the merge,
    // and its residual can only underestimate
    assert(merged.contains("x") && merged("x") <= 170L)
    // residual bound: underestimation ≤ n/(m+1) accumulated over both
    // passes and the merge
    assert(merged("x") >= 170L - 760L / 11 * 3)
  }

  test("mgMerge with an empty side is a pure capacity cap") {
    val big = (1 to 30).map(i => s"k$i" -> i.toLong).toMap
    val capped = CorpusOps.mgMerge(big, Map.empty, 10)
    assert(capped.size <= 10)
    // subtracting the 11th-largest (19) keeps exactly the top 10 ranks
    assert(capped.keySet.forall(k => k.drop(1).toInt > 20))
    assert(CorpusOps.mgMerge(Map.empty, Map.empty, 4).isEmpty)
  }

  test("heavyHitters output is exact regardless of candidate layout") {
    // the two-pass result must equal a naive exact computation
    val got = CorpusOps.heavyHitters(spark, sfTiny)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val terms = graft.schema.Tables.documents(spark, sfTiny)
      .select(explode(TextFns.tokens(col("text"))).as("term"))
    val total = terms.count()
    val naive = terms.groupBy("term").count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .filter { case (_, c) => c * 200 >= total }.toMap
    assert(got == naive, s"two-pass ${got.size} terms vs naive ${naive.size}")
  }

  // ---------- chunk plan invariants ----------

  test("chunkPlan covers every token with stride-aligned overlaps") {
    val rows = CorpusOps.chunkPlan(spark, sfTiny)
      .groupBy("doc_id")
      .agg(max(col("start_tok") + col("chunk_len") - 1).as("covered"),
        count(lit(1)).as("n_chunks"),
        min(col("chunk_len")).as("min_len"))
    val docs = graft.schema.Tables.documents(spark, sfTiny)
      .select(col("doc_id"), size(TextFns.tokens(col("text"))).cast("long").as("n_tok"))
    val joined = rows.join(docs, "doc_id")
    // last chunk ends exactly at the last token; every chunk non-empty
    assert(joined.filter(col("covered") =!= col("n_tok")).count() == 0)
    assert(joined.filter(col("min_len") <= 0).count() == 0)
    // chunk count matches the closed form ceil(max(n-W,0)/S)+1
    val bad = joined.filter(col("n_chunks") =!=
      (ceil(greatest(col("n_tok") - 32, lit(0L)).cast("double") / 24) + 1L))
    assert(bad.count() == 0)
  }

  test("chunkPlan explode stays outer (no inferred HOF filter)") {
    // same InferFiltersFromGenerate rule as dupNgrams (CLAUDE.md):
    // the chunk-index explode sits over a sequence() of the tokenize
    // pipeline's size — pin the outer generate + no HOF re-evaluation
    // in a physical filter
    val plan = CorpusOps.chunkPlan(spark, sfTiny).queryExecution.sparkPlan
    val gens = plan.collect {
      case g: org.apache.spark.sql.execution.GenerateExec => g
    }
    assert(gens.nonEmpty && gens.forall(_.outer),
      s"chunkPlan generate lost outer=true (${gens.size} generates)")
    val filters = plan.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f.condition.toString
    }
    assert(!filters.exists(_.contains("transform(")),
      s"inferred filter re-evaluates the token pipeline: $filters")
  }

  // ---------- apportionment conservation ----------

  test("mixSchedule allocations are integers summing exactly to the budget") {
    val alloc = CorpusOps.mixSchedule(spark, sfTiny)
    val total = alloc.agg(sum("alloc")).collect()(0).getLong(0)
    assert(total == 1000000L, s"largest-remainder sum drifted: $total")
    // proportionality: each source within 1 of its exact quota
    val toks = alloc.agg(sum("tokens")).collect()(0).getLong(0)
    val off = alloc.withColumn("exact",
      col("tokens").cast("double") * 1000000.0 / toks.toDouble)
      .filter(abs(col("alloc").cast("double") - col("exact")) >= 1.0)
    assert(off.count() == 0, "an allocation deviates >=1 from its exact quota")
  }

  test("temperatureMix conserves the budget and flattens toward uniform") {
    val out = CorpusOps.temperatureMix(spark, sfTiny).collect()
    assert(out.map(_.getAs[Long]("alloc")).sum == CorpusOps.TempBudget,
      "temperature allocations must sum exactly to the budget")
    // flattening: allocation shares sit strictly between the raw doc
    // share and uniform for every non-boundary language (sqrt pulls
    // p < 1/k up and p > 1/k down, never past uniform)
    val nTot = out.map(_.getAs[Long]("n_docs")).sum.toDouble
    val k = out.length.toDouble
    out.foreach { r =>
      val p = r.getAs[Long]("n_docs") / nTot
      val share = r.getAs[Long]("alloc") / CorpusOps.TempBudget.toDouble
      if (math.abs(p - 1.0 / k) > 0.01) {
        val lo = math.min(p, 1.0 / k) - 0.01
        val hi = math.max(p, 1.0 / k) + 0.01
        assert(share > lo && share < hi,
          s"${r.getAs[String]("lang")}: share $share outside ($lo, $hi) for p=$p")
      }
      // order preserved: weights are monotone in p
    }
    val byDocs = out.sortBy(_.getAs[Long]("n_docs")).map(_.getAs[Long]("alloc"))
    assert(byDocs.zip(byDocs.tail).forall { case (a, b) => a <= b },
      "temperature weights must preserve the document-count order")
  }
}
