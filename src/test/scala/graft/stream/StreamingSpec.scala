package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

/** Structured Streaming semantics under a real micro-batch engine
  * (MemoryStream → memory sink): windowed aggregation with watermark,
  * watermark-bounded dedup, and keyed running state. The reference has
  * no streaming at all (SURVEY.md §2.7) — these pin the extension
  * surface.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("windowedCounts aggregates by tumbling event-time window") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String, Double)]
    val events = input.toDF().toDF("ts", "user_id", "event_type", "value")
    val q = Streaming.windowedCounts(events, "10 minutes", lateness = "5 minutes")
      .writeStream.format("memory").queryName("wc").outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (ts(1), 1L, "click", 1.0), (ts(2), 2L, "click", 2.0),
        (ts(11), 1L, "view", 3.0),
        (ts(40), 1L, "click", 9.0)) // advances watermark past both windows
      q.processAllAvailable()
      val rows = spark.table("wc")
        .select("window_start", "event_type", "n_events", "sum_value")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(rows.contains((ts(0), "click", 2L, 3.0)))
      assert(rows.contains((ts(10), "view", 1L, 3.0)))
    } finally q.stop()
  }

  test("dedupWithinWatermark drops duplicate keys inside the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String, Double)]
    val events = input.toDF().toDF("ts", "user_id", "event_type", "value")
    val q = Streaming.dedupWithinWatermark(events, Seq("user_id", "event_type"),
        lateness = "30 minutes")
      .writeStream.format("memory").queryName("dd").outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (ts(1), 1L, "click", 1.0), (ts(2), 1L, "click", 99.0), // dup key
        (ts(3), 2L, "click", 2.0))
      q.processAllAvailable()
      assert(spark.table("dd").count() == 2)
    } finally q.stop()
  }

  test("startParquetSink writes watermark-closed windows exactly-once") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val input = MemoryStream[(Timestamp, Long, String, Double)]
    val events = input.toDF().toDF("ts", "user_id", "event_type", "value")
    val q = Streaming.startParquetSink(
      Streaming.windowedCounts(events, "10 minutes", lateness = "5 minutes"),
      s"$dir/out", s"$dir/chk")
    try {
      input.addData((ts(1), 1L, "click", 1.0), (ts(2), 2L, "click", 2.0))
      q.processAllAvailable()
      input.addData((ts(40), 1L, "view", 9.0)) // watermark passes window [0,10)
      q.processAllAvailable()
      val rows = spark.read.parquet(s"$dir/out")
        .select("event_type", "n_events", "sum_value").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows.contains(("click", 2L, 3.0)))
    } finally q.stop()
  }

  test("startHeavyHitterSink keeps a bounded summary with the hot term across batches") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("hh").toString
    val input = MemoryStream[String]
    val terms = input.toDF().toDF("term")
    val q = Streaming.startHeavyHitterSink(terms, s"$dir/snap", s"$dir/chk", m = 8)
    try {
      input.addData(Seq.fill(30)("hot") ++ (1 to 100).map(i => s"t$i"): _*)
      q.processAllAvailable()
      input.addData(Seq.fill(25)("hot") ++ (101 to 200).map(i => s"t$i"): _*)
      q.processAllAvailable()
      val rows = spark.read.parquet(s"$dir/snap").collect()
      assert(rows.length <= 8, s"summary exceeded capacity: ${rows.length}")
      assert(rows.head.getAs[Long]("n_total") == 255L)
      val hot = rows.find(_.getString(0) == "hot")
        .getOrElse(fail("hot term (55/255 > n/(m+1)) lost from summary"))
      val cnt = hot.getAs[Long]("cnt")
      assert(cnt >= 1L && cnt <= 55L, s"residual outside [1, true count]: $cnt")
    } finally q.stop()
  }

  test("startHeavyHitterSink survives an empty-summary batch without resetting n_total") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("hh0").toString
    val input = MemoryStream[String]
    val terms = input.toDF().toDF("term")
    // m=2 and a 3-distinct-terms batch: Misra-Gries fills {a,b}, then c
    // decrements both to zero — the persisted summary has ZERO rows, so
    // the n_total COLUMN vanishes with it. The _n_total side file must
    // carry the running total across that batch.
    val q = Streaming.startHeavyHitterSink(terms, s"$dir/snap", s"$dir/chk", m = 2)
    try {
      input.addData("a", "b", "c")
      q.processAllAvailable()
      assert(spark.read.parquet(s"$dir/snap").count() == 0L,
        "precondition: the all-ties batch should zero the summary")
      input.addData(Seq.fill(5)("hot"): _*)
      q.processAllAvailable()
      val rows = spark.read.parquet(s"$dir/snap").collect()
      val hot = rows.find(_.getString(0) == "hot")
        .getOrElse(fail("hot term lost from summary"))
      assert(hot.getAs[Long]("n_total") == 8L,
        s"running total reset: ${hot.getAs[Long]("n_total")} != 3 + 5")
    } finally q.stop()
  }

  test("clickAttributionOuter emits unmatched clicks with nulls after the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val vIn = MemoryStream[(Timestamp, Long)]
    val cIn = MemoryStream[(Timestamp, Long, Double)]
    val views = vIn.toDF().toDF("ts", "user_id")
    val clicks = cIn.toDF().toDF("ts", "user_id", "value")
    val q = Streaming.clickAttributionOuter(views, clicks,
        horizon = "30 minutes", lateness = "10 minutes")
      .writeStream.format("memory").queryName("cao").outputMode(OutputMode.Append).start()
    try {
      vIn.addData((ts(1), 1L)) // user 1 has a view in horizon
      cIn.addData((ts(5), 1L, 1.0), (ts(6), 2L, 2.0)) // user 2: no view
      q.processAllAvailable()
      // advance BOTH sides' watermarks far past click+lateness, then
      // run further batches so eviction emits the unmatched row
      vIn.addData((ts(59), 9L))
      cIn.addData((ts(59), 9L, 0.0))
      q.processAllAvailable()
      vIn.addData((ts(59), 8L))
      cIn.addData((ts(59), 8L, 0.0))
      q.processAllAvailable()
      val rows = spark.table("cao")
        .select("user_id", "view_ts", "click_ts", "value").collect()
        .map(r => (r.getLong(0), Option(r.getTimestamp(1)), r.getTimestamp(2), r.getDouble(3)))
      assert(rows.contains((1L, Some(ts(1)), ts(5), 1.0)), "matched click lost its view")
      assert(rows.contains((2L, None, ts(6), 2.0)),
        s"unmatched click never emitted with nulls: ${rows.mkString("; ")}")
      // exactly-once: the matched click appears once, not once per state pass
      assert(rows.count(_._1 == 1L) == 1)
    } finally q.stop()
  }

  test("startCmsSink folds per-batch sketches into the whole-stream counter table") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("cms").toString
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = Streaming.startCmsSink(docs, s"$dir/snap", s"$dir/chk")
    try {
      input.addData((1L, "alpha beta alpha"), (2L, "beta gamma"))
      q.processAllAvailable()
      input.addData((3L, "alpha delta delta"))
      q.processAllAvailable()
      val got = spark.read.parquet(s"$dir/snap").collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      // the streamed snapshot must equal the one-shot sketch of the
      // full stream — the mergeability law, exercised via the sink
      import spark.implicits._
      val whole = graft.text.DocOps.cmsCells(
        Seq((1L, "alpha beta alpha"), (2L, "beta gamma"), (3L, "alpha delta delta"))
          .toDF("doc_id", "text"))
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == whole, "streamed counter table diverged from the one-shot sketch")
    } finally q.stop()
  }

  test("startDedupIngest screens batches against the persisted index across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = Streaming.startDedupIngest(docs, s"$dir/dedup", s"$dir/chk")
    try {
      // batch 1: two distinct docs + an in-batch exact dup of doc 1
      input.addData(
        (1L, "alpha beta gamma delta epsilon zeta"),
        (5L, "alpha beta gamma delta epsilon zeta"), // in-batch dup of 1
        (2L, "completely different second document text"))
      q.processAllAvailable()
      // batch 2: a cross-batch dup of doc 1 + a genuinely new doc
      input.addData(
        (3L, "alpha beta gamma delta epsilon zeta"), // dup of ingested 1
        (4L, "yet another unrelated document body here"))
      q.processAllAvailable()
      val corpus = spark.read.parquet(s"$dir/dedup/corpus")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(corpus == Set(1L, 2L, 4L),
        s"expected in-batch dup 5 and cross-batch dup 3 dropped, got $corpus")
      // the index holds bands for exactly the accepted docs
      val indexed = spark.read.parquet(s"$dir/dedup/index")
        .select("idx_doc").distinct().collect().map(_.getLong(0)).toSet
      assert(indexed == Set(1L, 2L, 4L))
    } finally q.stop()
  }

  test("dedupIngestBatch replay converges (at-least-once safety)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ingest_rp").toString
    val batch = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "completely different second document text")).toDF("doc_id", "text")
    def state() = (
      spark.read.parquet(s"$dir/dedup/corpus").orderBy("doc_id").collect().toSeq,
      spark.read.parquet(s"$dir/dedup/index")
        .orderBy("band", "idx_doc").collect().toSeq)
    Streaming.dedupIngestBatch(batch, s"$dir/dedup", new RenameCommitter(_, _))
    val first = state()
    // the checkpoint replays the SAME batch after a crash — state must
    // not change (docs collide with their own indexed bands; the
    // corpus upsert and distinct band union are no-ops)
    Streaming.dedupIngestBatch(batch, s"$dir/dedup", new RenameCommitter(_, _))
    assert(state() == first, "replaying the identical batch changed state")
  }

  test("startNoveltyIngest batch-2 report matches q_delta_novelty against the batch-1 index") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_novelty").toString
    val all = graft.schema.Tables.documents(spark, sfTiny)
      .select("doc_id", "source", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val input = MemoryStream[(Long, String, String)]
    val docs = input.toDF().toDF("doc_id", "source", "text")
    val q = Streaming.startNoveltyIngest(docs, s"$dir/nov", s"$dir/chk")
    try {
      // batch 1 = the even half (q_delta_novelty's "indexed corpus"),
      // batch 2 = the odd half (its "incoming feed") — the streamed
      // batch-2 report must be row-identical to the oracle-gated query,
      // which rebuilds the same index from scratch each run.
      input.addData(all.filter(_._1 % 2 == 0).toSeq)
      q.processAllAvailable()
      input.addData(all.filter(_._1 % 2 == 1).toSeq)
      q.processAllAvailable()
      val streamed = spark.read.parquet(s"$dir/nov/report")
        .filter($"batch_id" === 1L)
        .select("source", "n_docs", "n_grams", "n_novel", "novelty")
        .orderBy("source").collect().toSeq
      val oracle = graft.text.DocOps.deltaNovelty(spark, sfTiny).collect().toSeq
      assert(streamed.nonEmpty, "batch-2 novelty report is vacuous")
      assert(streamed == oracle,
        s"streamed batch-2 report diverges from q_delta_novelty:\n$streamed\nvs\n$oracle")
    } finally q.stop()
  }

  test("noveltyIngestBatch replay converges (at-least-once safety)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_novelty_rp").toString
    val b1 = Seq((2L, "web", "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "source", "text")
    val b2 = Seq(
      (3L, "web", "alpha beta gamma delta epsilon zeta eta theta"), // all grams indexed
      (5L, "books", "completely novel second document body text here"))
      .toDF("doc_id", "source", "text")
    def state() = (
      spark.read.parquet(s"$dir/nov/report").orderBy("batch_id", "source").collect().toSeq,
      spark.read.parquet(s"$dir/nov/index").orderBy("gram").collect().toSeq)
    Streaming.noveltyIngestBatch(b1, 0L, s"$dir/nov", new RenameCommitter(_, _))
    Streaming.noveltyIngestBatch(b2, 1L, s"$dir/nov", new RenameCommitter(_, _))
    val first = state()
    // doc 3 repeats doc 2's grams → 0 novel; doc 5 is all-novel
    val byKey = first._1.map(r => (r.getLong(0), r.getString(1)) -> r.getLong(4)).toMap
    assert(byKey((1L, "web")) == 0L, s"expected indexed grams non-novel: $first")
    assert(byKey((1L, "books")) > 0L, s"expected fresh doc fully novel: $first")
    // the WORST replay point: after the index commit (crash before
    // the checkpoint offset commit). The recomputed report would see
    // the batch's own grams indexed and claim zero novelty —
    // first-write-wins must discard it. Distinct gram union keeps the
    // index fixed. State must not change.
    Streaming.noveltyIngestBatch(b2, 1L, s"$dir/nov", new RenameCommitter(_, _))
    assert(state() == first, "replaying the identical batch changed state")
  }

  test("startUpsertSink merges each micro-batch into the snapshot by key") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    val input = MemoryStream[(String, Int)]
    val updates = input.toDF().toDF("k", "v")
    val q = Streaming.startUpsertSink(updates, s"$dir/snap", s"$dir/chk", Seq("k"))
    try {
      input.addData(("a", 1), ("b", 2))
      q.processAllAvailable()
      input.addData(("b", 99), ("c", 3)) // update b, insert c
      q.processAllAvailable()
      val got = spark.read.parquet(s"$dir/snap").orderBy("k")
        .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
      assert(got == Seq(("a", 1), ("b", 99), ("c", 3)))
    } finally q.stop()
  }

  test("clickAttribution joins clicks to in-horizon views, stream-stream") {
    implicit val sqlCtx = spark.sqlContext
    val viewsIn = MemoryStream[(Timestamp, Long, String, Double)]
    val clicksIn = MemoryStream[(Timestamp, Long, String, Double)]
    val views = viewsIn.toDF().toDF("ts", "user_id", "event_type", "value")
    val clicks = clicksIn.toDF().toDF("ts", "user_id", "event_type", "value")
    val q = Streaming.clickAttribution(views, clicks, horizon = "10 minutes")
      .writeStream.format("memory").queryName("attr")
      .outputMode(OutputMode.Append).start()
    try {
      viewsIn.addData(
        (ts(1), 1L, "view", 0.0), // in horizon of 1's click at :08
        (ts(2), 2L, "view", 0.0)) // 2 never clicks
      clicksIn.addData(
        (ts(8), 1L, "click", 5.0),
        (ts(30), 3L, "click", 7.0)) // 3 never viewed
      q.processAllAvailable()
      val got = spark.table("attr")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2)))
      assert(got.toSeq == Seq((1L, ts(1), ts(8))))
    } finally q.stop()
  }

  test("startUpsertSink recovers a crash between the two swap renames") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_rec").toString
    // Simulate the worst-case crash window: the current snapshot was
    // renamed away to .old and the process died before .next moved in
    // — on disk: no `snap`, a complete `snap.next`, a stale `snap.old`.
    Seq(("a", 1), ("b", 2)).toDF("k", "v")
      .write.parquet(s"$dir/snap.next")
    Seq(("a", 0)).toDF("k", "v").write.parquet(s"$dir/snap.old")
    val input = MemoryStream[(String, Int)]
    val q = Streaming.startUpsertSink(
      input.toDF().toDF("k", "v"), s"$dir/snap", s"$dir/chk", Seq("k"))
    try {
      input.addData(("b", 99)) // replayed update lands on the RECOVERED state
      q.processAllAvailable()
      val got = spark.read.parquet(s"$dir/snap").orderBy("k")
        .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
      assert(got == Seq(("a", 1), ("b", 99)))
      assert(!new java.io.File(s"$dir/snap.old").exists)
      assert(!new java.io.File(s"$dir/snap.next").exists)
    } finally q.stop()
  }

  test("startUpsertSink with ManifestCommitter merges batches and keeps one version") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_m").toString
    val input = MemoryStream[(String, Int)]
    val q = Streaming.startUpsertSink(
      input.toDF().toDF("k", "v"), s"$dir/snap", s"$dir/chk", Seq("k"),
      committerFor = new ManifestCommitter(_, _))
    try {
      input.addData(("a", 1), ("b", 2))
      q.processAllAvailable()
      input.addData(("b", 99), ("c", 3)) // update b, insert c
      q.processAllAvailable()
      val committer = new ManifestCommitter(
        s"$dir/snap", spark.sparkContext.hadoopConfiguration)
      val cur = committer.current()
        .getOrElse(fail("no committed snapshot")).toString
      assert(cur.endsWith("/v2"), s"expected version 2, got $cur")
      val got = spark.read.parquet(cur).orderBy("k")
        .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
      assert(got == Seq(("a", 1), ("b", 99), ("c", 3)))
      // superseded v1 is swept after the pointer flip
      assert(!new java.io.File(s"$dir/snap/v1").exists)
    } finally q.stop()
  }

  test("ManifestCommitter with retention serves time-travel reads") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_tt").toString
    val input = MemoryStream[(String, Int)]
    val q = Streaming.startUpsertSink(
      input.toDF().toDF("k", "v"), s"$dir/snap", s"$dir/chk", Seq("k"),
      committerFor = new ManifestCommitter(_, _, retain = 2))
    try {
      input.addData(("a", 1), ("b", 2))
      q.processAllAvailable()
      input.addData(("b", 99), ("c", 3))
      q.processAllAvailable()
      input.addData(("d", 4))
      q.processAllAvailable()
      val c = new ManifestCommitter(
        s"$dir/snap", spark.sparkContext.hadoopConfiguration, retain = 2)
      assert(c.versions() == Seq(3L, 2L), s"window: ${c.versions()}")
      // current = all three batches merged
      val cur = spark.read.parquet(c.current().get.toString).orderBy("k")
        .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
      assert(cur == Seq(("a", 1), ("b", 99), ("c", 3), ("d", 4)))
      // time travel: version 2 is the pre-third-batch state
      val v2 = spark.read.parquet(c.snapshotAt(2L).get.toString).orderBy("k")
        .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
      assert(v2 == Seq(("a", 1), ("b", 99), ("c", 3)))
      // v1 left the window and was swept; snapshotAt refuses it
      assert(c.snapshotAt(1L).isEmpty)
      assert(!new java.io.File(s"$dir/snap/v1").exists)
    } finally q.stop()
  }

  test("ManifestCommitter rolls back a crash before the manifest flip") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_mrec").toString
    val conf = spark.sparkContext.hadoopConfiguration
    // Committed state: v1 = {a:1, b:2}, MANIFEST -> 1.
    val boot = new ManifestCommitter(s"$dir/snap", conf)
    Seq(("a", 1), ("b", 2)).toDF("k", "v").write.parquet(s"$dir/snap/v1")
    boot.commit(new org.apache.hadoop.fs.Path(s"$dir/snap/v1"))
    // Worst-case crash window: the next batch fully staged v2 and even
    // wrote MANIFEST.tmp, but died before the atomic pointer rename —
    // the commit never happened, so v2 and the tmp are garbage.
    Seq(("a", 777)).toDF("k", "v").write.parquet(s"$dir/snap/v2")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/snap/MANIFEST.tmp"), "2")
    val input = MemoryStream[(String, Int)]
    val q = Streaming.startUpsertSink(
      input.toDF().toDF("k", "v"), s"$dir/snap", s"$dir/chk", Seq("k"),
      committerFor = new ManifestCommitter(_, _))
    try {
      input.addData(("b", 99)) // replayed update merges onto v1, NOT v2
      q.processAllAvailable()
      val cur = new ManifestCommitter(s"$dir/snap", conf).current()
        .getOrElse(fail("no committed snapshot")).toString
      assert(cur.endsWith("/v2"), s"expected re-staged version 2, got $cur")
      val got = spark.read.parquet(cur).orderBy("k")
        .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
      assert(got == Seq(("a", 1), ("b", 99)))
      assert(!new java.io.File(s"$dir/snap/MANIFEST.tmp").exists)
      assert(!new java.io.File(s"$dir/snap/v1").exists)
    } finally q.stop()
  }

  test("closedSessions emits a session only after the gap passes") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_cs").toString
    val input = MemoryStream[(Timestamp, Long, String, Double)]
    val events = input.toDF().toDF("ts", "user_id", "event_type", "value")
    // Trigger.Once + shared checkpoint instead of processAllAvailable:
    // ProcessingTimeTimeout under a continuous trigger schedules
    // no-data batches forever (see verify skill notes), so each pass
    // runs exactly one batch and the SECOND pass's batch fires
    // timeouts. Sink is foreachBatch→parquet: the memory sink can't
    // recover from a checkpoint across query restarts.
    def runOnce(): Unit = {
      val q = Streaming.closedSessions(events, gap = "1 second")
        .writeStream
        .outputMode(OutputMode.Append)
        .option("checkpointLocation", s"$dir/chk")
        .trigger(org.apache.spark.sql.streaming.Trigger.Once())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(s"$dir/out"); ()
        }
        .start()
      q.awaitTermination()
    }
    input.addData((ts(1), 7L, "click", 2.0), (ts(2), 7L, "click", 3.0))
    runOnce()
    assert(spark.read.parquet(s"$dir/out").count() == 0,
      "open session must not emit")
    Thread.sleep(1500) // let the 1s inactivity gap elapse
    input.addData((ts(3), 8L, "click", 1.0)) // unrelated user drives the batch
    runOnce()
    val rows = spark.read.parquet(s"$dir/out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.contains((7L, 2L, 5.0)), s"got ${rows.toSeq}")
  }

  test("curation kernels run unchanged on a stream (quality gate)") {
    implicit val sqlCtx = spark.sqlContext
    import graft.text.TextFns
    import org.apache.spark.sql.functions.col
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
      .withColumn("ts", TextFns.tokens(col("text")))
      .withColumn("grams", TextFns.wordNgramsFromTokens(col("ts"), 2))
      .withColumn("quality",
        TextFns.round4(TextFns.qualityScore(col("text"), col("ts"))))
      .withColumn("rep", TextFns.repetitionRatio(col("grams")))
      .filter(col("rep") < 0.5) // drop degenerate repeats, stream-side
      .select("doc_id", "quality", "rep")
    val q = docs.writeStream.format("memory").queryName("curate_stream")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (1L, "the quick brown fox jumps over the lazy dog, with style."),
        (2L, "spam spam spam spam spam spam spam spam")) // pure repetition
      q.processAllAvailable()
      val got = spark.table("curate_stream").collect()
        .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      assert(got.contains(1L) && !got.contains(2L))
      assert(got(1L)._1 > 0.0 && got(1L)._2 < 0.5)
    } finally q.stop()
  }

  test("runningUserTotals keeps per-user state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String, Double)]
    val events = input.toDF().toDF("ts", "user_id", "event_type", "value")
    val q = Streaming.runningUserTotals(events, timeout = None)
      .writeStream.format("memory").queryName("rt").outputMode(OutputMode.Update).start()
    try {
      input.addData((ts(1), 7L, "click", 1.5))
      q.processAllAvailable()
      input.addData((ts(2), 7L, "click", 2.5))
      q.processAllAvailable()
      val last = spark.table("rt").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .filter(_._1 == 7L).maxBy(_._2)
      assert(last == ((7L, 2L, 4.0)))
    } finally q.stop()
  }

  test("funnelConversions detects ordered stages across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String, Double)]
    val events = input.toDF().toDF("ts", "user_id", "event_type", "value")
    // timeout = None: the default ProcessingTimeTimeout never fires
    // under processAllAvailable's 0-interval trigger (query hangs)
    val q = Streaming.funnelConversions(events, timeout = None)
      .writeStream.format("memory").queryName("fc").outputMode(OutputMode.Append).start()
    try {
      // user 1: view + click in batch 1 … purchase in batch 2 (state
      // must survive the batch boundary). user 2: purchase BEFORE its
      // click — ordered semantics must reject it. user 3: full funnel
      // delivered out of order INSIDE one batch — the per-batch sort
      // must recover it.
      input.addData(
        (ts(1), 1L, "view", 0.0), (ts(2), 1L, "click", 0.0),
        (ts(1), 2L, "view", 0.0), (ts(3), 2L, "purchase", 0.0),
        (ts(5), 3L, "purchase", 0.0), (ts(2), 3L, "view", 0.0),
        (ts(4), 3L, "click", 0.0))
      q.processAllAvailable()
      input.addData(
        (ts(9), 1L, "purchase", 0.0),
        (ts(9), 2L, "click", 0.0)) // too late: funnel already mis-ordered
      q.processAllAvailable()
      val got = spark.table("fc").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      def us(minute: Int): Long = ts(minute).getTime * 1000L
      assert(got == Set(
        (1L, us(1), us(2), us(9)),
        (3L, us(2), us(4), us(5))), s"got $got")
      // repeat conversion: state reset means a second full pass emits
      input.addData(
        (ts(11), 1L, "view", 0.0), (ts(12), 1L, "click", 0.0),
        (ts(13), 1L, "purchase", 0.0))
      q.processAllAvailable()
      assert(spark.table("fc").count() == 3)
      // same-instant progression in ONE batch: the >= guards admit it,
      // so the in-batch sort must present stage order at equal
      // timestamps (lexicographic event_type would drop it)
      input.addData(
        (ts(20), 9L, "view", 0.0), (ts(20), 9L, "click", 0.0),
        (ts(20), 9L, "purchase", 0.0))
      q.processAllAvailable()
      assert(spark.table("fc").filter("user_id = 9").count() == 1)
    } finally q.stop()
  }

  test("cusumMonitor equals the batch closed form across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    // daily cents series with a level shift at t=5 (the drift CUSUM
    // must accumulate); target mean 100 cents, 5% slack per the
    // Analytics.cusumDrift scaling
    val series = Seq(100L, 90L, 110L, 95L, 105L, 160L, 170L, 150L)
    val target = 100L
    // driver-side oracle: the EXACT batch identity S = R − min(0, min
    // prefix R), folded in order on scaled-integer deviations
    val devs = series.map(c => 20L * c - 21L * target)
    val rs = devs.scanLeft(0L)(_ + _).tail
    val expected = (rs.last - math.min(rs.min, 0L)).toDouble / 2000.0
    val input = MemoryStream[(Long, Long, Long)]
    val points = input.toDF().toDF("key", "ts", "cents")
    val q = Streaming.cusumMonitor(points, target)
      .writeStream.format("memory").queryName("cm")
      .outputMode(OutputMode.Update).start()
    try {
      // split mid-series: state must carry R and minR over the boundary
      input.addData(series.take(4).zipWithIndex.map {
        case (c, i) => (1L, i.toLong, c) })
      q.processAllAvailable()
      input.addData(series.drop(4).zipWithIndex.map {
        case (c, i) => (1L, (i + 4).toLong, c) })
      q.processAllAvailable()
      val last = spark.table("cm").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .filter(_._1 == 1L).maxBy(_._2)
      assert(last._2 == series.size)
      assert(last._3 == expected)
      // the shifted tail must have tripped the statistic upward
      assert(last._3 > 0.0)
    } finally q.stop()
  }
}
