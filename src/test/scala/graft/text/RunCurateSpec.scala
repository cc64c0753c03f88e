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
      Seq("annotate", "quality", "exact", "neardup", "corpus"))
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

  test("corpus_by_lang is partitioned by predicted language") {
    stats // force
    val dirs = new java.io.File(s"$outDir/corpus_by_lang").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("lang_pred=")))
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
