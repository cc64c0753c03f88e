package graft.text

import graft.SparkSpec
import graft.schema.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Proves the production property [[TextQueries.deltaDedup]]'s
  * docstring claims: a (band, idx_doc) index persisted to parquet
  * once per ingest, APPENDED for each accepted batch, screens a new
  * batch identically to recomputing the index from all corpus text —
  * i.e. the incremental deployment is exact, not approximate. (The
  * oracle-verified q_delta_dedup covers the single-shot demo; this
  * covers the persisted/append path the demo can't.)
  */
class DeltaDedupSpec extends SparkSpec {

  private def docs: DataFrame = Tables.documents(spark, sfTiny)

  private def collectScreen(df: DataFrame): Seq[(Long, Long, Long)] =
    df.collect().toSeq.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).sorted

  test("screening against a persisted+appended band index matches a full recompute") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bandidx").toString
    // ingest 1: corpus = doc_id % 3 == 0 — persist its band index
    val batch1 = docs.filter(col("doc_id") % 3 === 0)
    TextQueries.bandIndex(batch1).write.mode("overwrite").parquet(dir)
    // ingest 2: batch = doc_id % 3 == 1 passes screening and is
    // ACCEPTED into the corpus — append only its index rows
    val batch2 = docs.filter(col("doc_id") % 3 === 1)
    TextQueries.bandIndex(batch2).write.mode("append").parquet(dir)
    // ingest 3: screen the remaining docs against the read-back index
    val incoming = docs.filter(col("doc_id") % 3 === 2)
    val incremental = TextQueries.screenAgainstIndex(
      incoming, spark.read.parquet(dir))
    // ground truth: recompute the index from ALL ingested text
    val full = TextQueries.screenAgainstIndex(
      incoming, TextQueries.bandIndex(docs.filter(col("doc_id") % 3 =!= 2)))
    val inc = collectScreen(incremental)
    val ful = collectScreen(full)
    assert(inc.nonEmpty, "screen result is vacuous at sf0.001")
    assert(inc == ful,
      s"incremental screen diverged from full recompute: ${inc.size} vs ${ful.size} rows")
  }

  test("demo deltaDedup equals screenAgainstIndex composition") {
    val demo = collectScreen(TextQueries.deltaDedup(spark, sfTiny))
    val composed = collectScreen(TextQueries.screenAgainstIndex(
      docs.filter(col("doc_id") % 2 === 1),
      TextQueries.bandIndex(docs.filter(col("doc_id") % 2 === 0))))
    assert(demo.nonEmpty && demo == composed)
  }
}
