package graft.stream

import graft.SparkSpec
import graft.stream.EventQueries.{L3Ev, L3Out, MsEv, MsOut, MsHourly, L3Recent,
  TmrEv, TwsEv, TwsInit, TwsOut, TwsTimer, TwsTypeStats}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
import java.sql.Timestamp

/** Unit pins for the four state-v2 (`transformWithState`) processors
  * OFF the oracle path (round-14 verdict #4): the oracle queries gate
  * final LWW state only, so an out-of-order-merge or restore bug there
  * surfaces as a hash mismatch — the hardest failure to debug. These
  * drive each processor through a real micro-batch engine
  * (MemoryStream, one batch per addData) with hand-picked inputs and
  * assert the per-batch emissions, pinning:
  *  - ValueState merge across out-of-order batches ([[TwsTypeStats]])
  *  - initial-state seeding + the seed-only-key no-re-emit contract
  *    ([[TwsInit]] — the limitation the q_stream_init sink compensates
  *    for with its bid=-1 seed union)
  *  - ListState re-ranking of prior state against later, EARLIER-
  *    timestamped arrivals ([[L3Recent]])
  *  - MapState cell-wise accumulation across batches ([[MsHourly]])
  *  - event-time timer arming/expiry: no emission before the
  *    watermark crosses the flush instant, exactly-once firing, state
  *    cleared by the fire ([[TwsTimer]])
  *  - processing-time timer arming/expiry ([[EventQueries.TwsProcTimer]]
  *    — the TimeMode.ProcessingTime leg, inherently wall-clock-
  *    nondeterministic and therefore spec-only by design): fires once
  *    after the delay in a self-scheduled batch, clears state. NOTE:
  *    a pending processing-time timer keeps "work available" up, so
  *    processAllAvailable never returns — that test polls the sink.
  *
  * The state-v2 API requires the RocksDB state-store provider; it is
  * scoped per test and restored (shared session).
  */
class TwsProcessorSpec extends SparkSpec {
  import spark.implicits._

  private def withRocksDb[A](body: => A): A = {
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(v) => spark.conf.set(provKey, v)
      case None => spark.conf.unset(provKey)
    }
  }

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_tws_$tag").toString

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("TwsTypeStats merges ValueState across out-of-order batches") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(String, Long, Long)]
      val evs = input.toDF().toDF("event_type", "event_id", "vm").as[TwsEv]
      val q = evs.groupByKey(_.event_type)
        .transformWithState(new TwsTypeStats, TimeMode.None(), OutputMode.Update())
        .writeStream.format("memory").queryName("tws_v")
        .option("checkpointLocation", tmpDir("v"))
        .outputMode("update").start()
      try {
        input.addData(("a", 5L, 10L), ("a", 6L, 20L))
        q.processAllAvailable()
        // batch 2 arrives with SMALLER event ids — the fold must merge
        // onto restored state, and max must not regress
        input.addData(("a", 1L, 1L), ("a", 2L, 2L), ("b", 9L, 7L))
        q.processAllAvailable()
        val rows = spark.table("tws_v").as[TwsOut].collect()
        assert(rows.contains(TwsOut("a", 2L, 30L, 6L)))  // batch-1 emission
        assert(rows.contains(TwsOut("a", 4L, 33L, 6L)))  // merged, max kept
        assert(rows.contains(TwsOut("b", 1L, 7L, 9L)))
      } finally q.stop()
    }
  }

  test("TwsInit seeds state; seed-only keys never re-emit (documented)") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(String, Long, Long)]
      val evs = input.toDF().toDF("event_type", "event_id", "vm").as[TwsEv]
      val init = Seq(TwsOut("a", 2L, 10L, 7L), TwsOut("b", 5L, 50L, 40L))
        .toDS().groupByKey(_.event_type)
      val q = evs.groupByKey(_.event_type)
        .transformWithState(new TwsInit, TimeMode.None(), OutputMode.Update(), init)
        .writeStream.format("memory").queryName("tws_i")
        .option("checkpointLocation", tmpDir("i"))
        .outputMode("update").start()
      try {
        input.addData(("a", 9L, 5L))
        q.processAllAvailable()
        val rows = spark.table("tws_i").as[TwsOut].collect()
        // streamed key folds ON TOP of the seed
        assert(rows.contains(TwsOut("a", 3L, 15L, 9L)))
        // seed-only key writes state but produces NO output — the
        // contract q_stream_init's bid=-1 seed-union compensates for
        assert(!rows.exists(_.event_type == "b"))
      } finally q.stop()
    }
  }

  test("L3Recent re-ranks prior ListState against earlier-timestamped arrivals") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, Long, Long)]
      val evs = input.toDF().toDF("user_id", "event_id", "ts_us").as[L3Ev]
      val q = evs.groupByKey(_.user_id)
        .transformWithState(new L3Recent, TimeMode.None(), OutputMode.Update())
        .writeStream.format("memory").queryName("tws_l")
        .option("checkpointLocation", tmpDir("l"))
        .outputMode("update").start()
      try {
        input.addData((1L, 10L, 100L), (1L, 11L, 300L))
        q.processAllAvailable()
        // batch 2: OLDER timestamp than the stored head — must slot in
        // the middle, not append
        input.addData((1L, 12L, 200L))
        q.processAllAvailable()
        // batch 3: newest — list stays bounded at 3, oldest evicted
        input.addData((1L, 13L, 400L))
        q.processAllAvailable()
        val rows = spark.table("tws_l").as[L3Out].collect()
        assert(rows.contains(L3Out(1L, 2L, "11,10")))
        assert(rows.contains(L3Out(1L, 3L, "11,12,10")))
        assert(rows.contains(L3Out(1L, 4L, "13,11,12")))
      } finally q.stop()
    }
  }

  test("MsHourly accumulates MapState cell-wise across batches") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(String, Long, Long)]
      val evs = input.toDF().toDF("event_type", "hour", "vm").as[MsEv]
      val q = evs.groupByKey(_.event_type)
        .transformWithState(new MsHourly, TimeMode.None(), OutputMode.Update())
        .writeStream.format("memory").queryName("tws_m")
        .option("checkpointLocation", tmpDir("m"))
        .outputMode("update").start()
      try {
        input.addData(("click", 1L, 5L), ("click", 2L, 3L))
        q.processAllAvailable()
        input.addData(("click", 1L, 2L))  // touches ONE existing cell
        q.processAllAvailable()
        val rows = spark.table("tws_m").as[MsOut].collect()
        assert(rows.contains(MsOut("click", 2L, 2L, "1:1,2:1")))
        assert(rows.contains(MsOut("click", 2L, 3L, "1:2,2:1")))
      } finally q.stop()
    }
  }

  test("TwsTimer emits only on watermark-crossed expiry and clears state") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(String, Long, Long, Timestamp)]
      val evs = input.toDF().toDF("event_type", "event_id", "vm", "ts")
        .withWatermark("ts", "0 seconds").as[TmrEv]
      val flushAt = ts(30).getTime
      val q = evs.groupByKey(_.event_type)
        .transformWithState(new TwsTimer(flushAt),
          TimeMode.EventTime(), OutputMode.Update())
        .writeStream.format("memory").queryName("tws_t")
        .option("checkpointLocation", tmpDir("t"))
        .outputMode("update").start()
      try {
        input.addData(("a", 1L, 10L, ts(0)), ("a", 2L, 20L, ts(5)))
        q.processAllAvailable()
        // watermark still at 10:05 < flush instant: NOTHING emitted
        assert(spark.table("tws_t").count() == 0)
        // sentinel batch 1 advances the watermark past the flush
        // instant at batch END; the timer fires in the NEXT batch
        input.addData(("zz", -1L, 0L, ts(40)))
        q.processAllAvailable()
        input.addData(("zz", -1L, 0L, ts(41)))
        q.processAllAvailable()
        val rows = spark.table("tws_t").as[TwsOut].collect()
        assert(rows.count(_.event_type == "a") == 1)
        assert(rows.contains(TwsOut("a", 2L, 30L, 2L)))
        // a further sentinel must NOT re-fire (timer consumed)
        input.addData(("zz", -1L, 0L, ts(42)))
        q.processAllAvailable()
        assert(spark.table("tws_t").as[TwsOut].collect()
          .count(_.event_type == "a") == 1)
        // state was CLEARED by the fire: a fresh "a" event re-arms at
        // the (already-passed) flush instant and re-emits from zero
        input.addData(("a", 3L, 7L, ts(43)))
        q.processAllAvailable()
        input.addData(("zz", -1L, 0L, ts(44)))
        q.processAllAvailable()
        input.addData(("zz", -1L, 0L, ts(45)))
        q.processAllAvailable()
        val after = spark.table("tws_t").as[TwsOut].collect()
        assert(after.contains(TwsOut("a", 1L, 7L, 3L)))
      } finally q.stop()
    }
  }

  test("TwsProcTimer (processing-time) fires once after the delay, clears state") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(String, Long, Long)]
      val evs = input.toDF().toDF("event_type", "event_id", "vm").as[TwsEv]
      // generous delay: the no-early-emission assert below must hold
      // even if the first batches take a while on a loaded machine
      val delayMs = 3000L
      val q = evs.groupByKey(_.event_type)
        .transformWithState(new EventQueries.TwsProcTimer(delayMs),
          TimeMode.ProcessingTime(), OutputMode.Update())
        .writeStream.format("memory").queryName("tws_p")
        .option("checkpointLocation", tmpDir("p"))
        .outputMode("update").start()
      // A PENDING processing-time timer keeps the engine's "work
      // available" signal up, so processAllAvailable NEVER RETURNS
      // here (verified: hung at the first call) — the wall-clock twin
      // of the SKILL's ProcessingTimeTimeout no-data-rerun gotcha.
      // The test therefore never calls it: the default trigger keeps
      // running batches on its own (the pending timer is work), and
      // the asserts POLL the sink.
      def rowsFor(k: String): Array[TwsOut] =
        spark.table("tws_p").as[TwsOut].collect().filter(_.event_type == k)
      def pollUntil(deadlineMs: Long)(cond: => Boolean): Boolean = {
        val limit = System.currentTimeMillis() + deadlineMs
        while (!cond && System.currentTimeMillis() < limit) Thread.sleep(100)
        cond
      }
      try {
        val t0 = System.currentTimeMillis()
        input.addData(("a", 1L, 10L), ("a", 2L, 20L))
        // inside the delay window nothing may emit (wall-clock guard:
        // only assert when provably still inside it)
        Thread.sleep(500)
        if (System.currentTimeMillis() - t0 < delayMs - 500)
          assert(rowsFor("a").isEmpty,
            "timer fired before its processing-time instant")
        // the engine fires the timer in a self-scheduled batch once
        // wall clock passes the instant — poll for the emission
        assert(pollUntil(30000)(rowsFor("a").length == 1),
          "processing-time timer never fired")
        assert(rowsFor("a").head == TwsOut("a", 2L, 30L, 2L))
        // consumed + state cleared: no re-emission afterward
        Thread.sleep(delayMs + 1000)
        assert(rowsFor("a").length == 1, "timer re-fired after consumption")
      } finally q.stop()
    }
  }
}
