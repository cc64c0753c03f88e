package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Corpus-curation funnel end-to-end: monotone survivor counts, gate
  * invariants on the final corpus (quality floor, no exact dups,
  * canonical near-dup members), language partitioning, and rerun
  * convergence.
  */
class RunCurateSpec extends SparkSpec {

  private lazy val outDir =
    java.nio.file.Files.createTempDirectory("graft_curate").toString
  private lazy val stats = RunCurate.curate(spark, sfTiny, outDir, minQuality = 0.5)

  test("stages run in funnel order with non-increasing survivors") {
    assert(stats.map(_.stage) ==
      Seq("annotate", "quality", "exact", "neardup", "decontam", "balance", "corpus"))
    stats.foreach(s => assert(s.rows > 0, s"${s.stage} kept no rows"))
    stats.sliding(2).foreach { case Seq(a, b) =>
      assert(b.rows <= a.rows, s"${b.stage} grew from ${a.stage}")
    }
    // the gates must actually gate on this corpus (non-vacuous)
    assert(stats.last.rows < stats.head.rows)
  }

  test("final corpus honors every gate") {
    stats // force
    val corpus = spark.read.parquet(s"$outDir/corpus").cache()
    assert(corpus.filter(col("quality") < 0.5).count() == 0)
    // the repetition gate must provably FIRE on this corpus (threshold
    // is calibrated so the input contains flagged docs) — otherwise
    // this assertion would pass with the gate deleted or inverted
    assert(spark.read.parquet(s"$outDir/annotate")
      .filter(col("is_repetitive")).count() > 0, "gate input is vacuous")
    assert(corpus.filter(col("is_repetitive")).count() == 0, "repetitive docs survived")
    assert(corpus.count() ==
      corpus.select("content_hash").distinct().count(), "exact dups survived")
    assert(corpus.filter(col("n_tokens") <= 0).count() == 0)
    val langs = corpus.select("lang_pred").distinct()
      .collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(TextFns.langMarkers.keySet))
    // decontamination gate: no held-out eval doc survives, and no
    // surviving doc shares an 8-gram with the eval slice (recompute
    // the kernel against the stage INPUT so the assert is independent
    // of the stage's own join)
    assert(corpus.filter(DocOps.isEvalDoc).count() == 0, "eval docs survived")
    val neardup = spark.read.parquet(s"$outDir/neardup")
    val contaminated = DocOps.contamHits(neardup.select("doc_id", "source", "text"))
      .filter(col("n_hits") > 0).select("doc_id")
    assert(corpus.join(contaminated, Seq("doc_id"), "left_semi").count() == 0,
      "contaminated docs survived")
    // non-vacuous: the gate must actually fire on this corpus
    assert(spark.read.parquet(s"$outDir/neardup").filter(DocOps.isEvalDoc).count() > 0,
      "no eval docs reached the gate — decontam stage is vacuous")
    corpus.unpersist()
  }

  test("corpus is packed into bounded training shards") {
    stats // force
    val corpus = spark.read.parquet(s"$outDir/corpus")
    val byShard = corpus.groupBy("shard")
      .agg(sum(col("n_tokens")).as("tok")).orderBy("shard")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(byShard.head._1 == 0L)
    // every shard's fill stays within capacity + one max-doc overhang
    val maxDoc = corpus.agg(max(col("n_tokens"))).collect().head.getLong(0)
    byShard.foreach { case (s, tok) =>
      assert(tok <= 50000L + maxDoc, s"shard $s overfilled: $tok")
    }
    // shard locality is FILE-level, not Hive-partition-level (shard
    // count is corpus-proportional): rows are shard-monotone in doc
    // order so parquet min/max prunes shard reads
    val inOrder = corpus.orderBy("doc_id")
      .select("shard").collect().map(_.getLong(0))
    inOrder.sliding(2).foreach { case Array(a, b) => assert(b >= a) }
  }

  test("chunks artifact covers every corpus document end-to-end") {
    stats // force
    val corpus = spark.read.parquet(s"$outDir/corpus")
    val chunks = spark.read.parquet(s"$outDir/chunks")
    // chunk grain: every corpus doc present, last chunk ends at the
    // last token, shard tag carried through
    val cover = chunks.groupBy("doc_id")
      .agg(max(col("start_tok") + col("chunk_len") - 1).as("covered"),
        min(col("chunk_len")).as("min_len"))
      .join(corpus.select(col("doc_id"), col("n_tokens"), col("shard")), "doc_id")
    assert(cover.count() == corpus.count(), "a corpus doc has no chunks")
    assert(cover.filter(col("covered") =!= col("n_tokens")).count() == 0,
      "chunk coverage does not end at the doc's last token")
    assert(cover.filter(col("min_len") <= 0).count() == 0)
    assert(chunks.join(corpus.select("doc_id", "shard"),
      Seq("doc_id", "shard")).count() == chunks.count(),
      "chunk shard tags diverge from the corpus")
  }

  test("corpus_by_lang is partitioned by predicted language") {
    stats // force
    val dirs = new java.io.File(s"$outDir/corpus_by_lang").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("lang_pred=")))
  }

  test("balance stage caps every source at the quota with best-by-quality selection") {
    import org.apache.spark.sql.expressions.Window
    val dir = java.nio.file.Files.createTempDirectory("graft_curate_q").toString
    // quota=2 so the cap actually bites at sf0.001; quality floor off
    // so the balance input is big enough to have >2 docs per source
    RunCurate.curate(spark, sfTiny, dir, minQuality = 0.0, quota = 2)
    val balance = spark.read.parquet(s"$dir/balance")
    val bySource = balance.groupBy("source").count().collect()
    assert(bySource.nonEmpty && bySource.forall(_.getLong(1) <= 2),
      "a source exceeded its quota")
    assert(balance.count() <
      spark.read.parquet(s"$dir/decontam").count(), "quota gated nothing")
    // kept set ≡ the single-window top-2 per source (two-phase rank
    // must compose to the same selection) over the balance INPUT —
    // the decontam snapshot
    val expect = spark.read.parquet(s"$dir/decontam")
      .withColumn("rk", row_number().over(Window.partitionBy("source")
        .orderBy(col("quality").desc, col("doc_id"))))
      .filter(col("rk") <= 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val got = balance.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expect, "quota selection diverged from the global rank")
  }

  test("rerun converges to the identical corpus") {
    stats // force the first build
    val first = spark.read.parquet(s"$outDir/corpus")
      .orderBy("doc_id").collect().toSeq
    val outDir2 = java.nio.file.Files.createTempDirectory("graft_curate2").toString
    RunCurate.curate(spark, sfTiny, outDir2, minQuality = 0.5)
    val second = spark.read.parquet(s"$outDir2/corpus")
      .orderBy("doc_id").collect().toSeq
    assert(first == second)
  }
}
