package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Join-based MERGE semantics (S7): last-writer-wins, surrogate
  * stability for existing keys, fresh ids for new keys, idempotence.
  */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def existing = Seq(
    ("alice", 30, 1L), ("bob", 40, 2L), ("carol", 50, 3L))
    .toDF("name", "score", "sk")

  private def updates = Seq(
    ("bob", 99), // update
    ("dave", 10), ("zoe", 20)) // inserts
    .toDF("name", "score")

  test("upsert: updates win, inserts appended, others untouched") {
    val merged = Merge.upsert(existing.drop("sk"), updates, Seq("name"))
      .orderBy("name").collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(merged == Seq(("alice", 30), ("bob", 99), ("carol", 50),
      ("dave", 10), ("zoe", 20)))
  }

  test("upsert is idempotent") {
    val once = Merge.upsert(existing.drop("sk"), updates, Seq("name"))
    val twice = Merge.upsert(once, updates, Seq("name"))
    assert(once.orderBy("name").collect().toSeq ==
      twice.orderBy("name").collect().toSeq)
  }

  test("upsertDim keeps surrogates for known keys, mints fresh above max") {
    val merged = Merge.upsertDim(existing, updates, Seq("name"), "sk",
      Seq(col("name")))
      .orderBy("name").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    assert(merged == Seq(
      ("alice", 30, 1L),
      ("bob", 99, 2L), // updated attrs, stable sk
      ("carol", 50, 3L),
      ("dave", 10, 4L), // fresh ids in business-key order above max=3
      ("zoe", 20, 5L)))
  }

  test("upsertDim converges when re-applied (same end state)") {
    val once = Merge.upsertDim(existing, updates, Seq("name"), "sk", Seq(col("name")))
    val twice = Merge.upsertDim(once, updates, Seq("name"), "sk", Seq(col("name")))
    assert(once.orderBy("name").collect().toSeq ==
      twice.orderBy("name").collect().toSeq)
  }

  test("upsertDim dedups duplicate business keys in updates (first-wins)") {
    val dupUpdates = Seq(("dave", 10), ("dave", 77), ("bob", 99))
      .toDF("name", "score")
    val merged = Merge.upsertDim(existing, dupUpdates, Seq("name"), "sk",
      Seq(col("score")))
      .orderBy("name").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    // dave appears ONCE (score 10 wins on the orderBy tiebreak) with
    // one fresh surrogate; re-application converges
    assert(merged == Seq(
      ("alice", 30, 1L), ("bob", 99, 2L), ("carol", 50, 3L),
      ("dave", 10, 4L)))
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")

  private def scdBase = Seq(
    // bob has history: a closed v1 and a current v2
    ("bob", 10, ts("2024-01-01"), Some(ts("2024-02-01")), false),
    ("bob", 40, ts("2024-02-01"), None, true),
    ("alice", 30, ts("2024-01-01"), None, true))
    .toDF("name", "score", "valid_from", "valid_to", "is_current")

  test("scd2: change closes the current version and opens a new one") {
    val out = Merge.scd2(scdBase,
      Seq(("bob", 99), ("dave", 10)).toDF("name", "score"),
      Seq("name"), Seq("score"), lit(ts("2024-03-01"))).cache()
    // bob: v1 history untouched, v2 closed at asOf, v3 current
    val bob = out.filter(col("name") === "bob").orderBy("valid_from")
      .collect().map(r => (r.getInt(1), r.getTimestamp(3), r.getBoolean(4)))
    assert(bob.toSeq == Seq(
      (10, ts("2024-02-01"), false),
      (40, ts("2024-03-01"), false),
      (99, null, true)))
    // alice untouched current; dave opens his first version
    assert(out.filter(col("name") === "alice" && col("is_current")).count() == 1)
    val dave = out.filter(col("name") === "dave").collect().head
    assert(dave.getTimestamp(2) == ts("2024-03-01") && dave.getBoolean(4))
    // invariant: exactly one current version per key
    assert(out.filter(col("is_current")).groupBy("name").count()
      .filter(col("count") > 1).count() == 0)
    out.unpersist()
  }

  test("scd2: attribute-identical update is a no-op (idempotence)") {
    val updates = Seq(("bob", 40), ("alice", 30)).toDF("name", "score")
    val once = Merge.scd2(scdBase, updates, Seq("name"), Seq("score"),
      lit(ts("2024-03-01")))
    assert(once.orderBy("name", "valid_from").collect().toSeq ==
      scdBase.orderBy("name", "valid_from").collect().toSeq)
  }

  test("scd2: duplicate business keys in one batch open exactly one version") {
    val out = Merge.scd2(scdBase,
      Seq(("bob", 77), ("bob", 88)).toDF("name", "score"), // dup key
      Seq("name"), Seq("score"), lit(ts("2024-03-01")))
    val current = out.filter(col("name") === "bob" && col("is_current")).collect()
    assert(current.length == 1)
    assert(current.head.getInt(1) == 77) // first-wins on attribute order
    // exactly one closed row was produced for the superseded version
    assert(out.filter(col("name") === "bob").count() == 3)
  }

  test("scd2: null-safe change detection (null attrs equal null)") {
    val base = Seq(("x", Option.empty[Integer], ts("2024-01-01"),
        Option.empty[java.sql.Timestamp], true))
      .toDF("name", "score", "valid_from", "valid_to", "is_current")
    val same = Merge.scd2(base,
      Seq(("x", Option.empty[Integer])).toDF("name", "score"),
      Seq("name"), Seq("score"), lit(ts("2024-02-01")))
    assert(same.count() == 1 && same.filter(col("is_current")).count() == 1)
    val changed = Merge.scd2(base,
      Seq(("x", Option(Integer.valueOf(7)))).toDF("name", "score"),
      Seq("name"), Seq("score"), lit(ts("2024-02-01")))
    assert(changed.count() == 2)
    assert(changed.filter(col("is_current")).collect().head.getInt(1) == 7)
  }

  test("upsertDim runs NO Spark job at plan-construction time") {
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          jobStart: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        counter.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      Merge.upsertDim(existing, updates, Seq("name"), "sk", Seq(col("name")))
      // listener events post asynchronously; an eager action would have
      // BLOCKED through its job, so its start event is already enqueued
      // — a short drain is enough to observe it
      Thread.sleep(500)
      assert(counter.get() == 0,
        s"plan construction launched ${counter.get()} Spark job(s)")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
