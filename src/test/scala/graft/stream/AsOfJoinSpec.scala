package graft.stream

import graft.SparkSpec
import java.sql.Timestamp

/** As-of join semantics on crafted frames: latest at-or-before match,
  * equal-timestamp inclusion, tie resolution, and no-match nulls.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("attaches latest right row at-or-before each left row") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-01 12:00:00"), 101L),
      (2L, ts("2024-01-01 10:30:00"), 102L))
      .toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 900L),
      (1L, ts("2024-01-01 11:59:59"), 901L),
      (2L, ts("2024-01-01 11:00:00"), 902L)) // AFTER left 102 → no match
      .toDF("user_id", "ts", "click_id")
    val got = AsOfJoin.asOf(left, right, "user_id", "ts", "click_id", Seq("click_id"))
      .orderBy("event_id")
      .collect()
      .map(r => (r.getAs[Long]("event_id"),
        Option(r.getAs[java.lang.Long]("click_id")).map(_.toLong)))
      .toSeq
    assert(got == Seq(
      (100L, Some(900L)), // only the 09:00 click precedes 10:00
      (101L, Some(901L)), // latest of the two
      (102L, None))) // right row is after the left row
  }

  test("null attribute in the matching row is NOT spliced from an older row") {
    val left = Seq((1L, ts("2024-01-01 12:00:00"), 100L))
      .toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), Some(5L)),
      (1L, ts("2024-01-01 11:00:00"), None)) // latest match carries null v
      .toDF("user_id", "ts", "v")
    val row = AsOfJoin.asOf(left, right, "user_id", "ts", "v", Seq("v"))
      .collect().head
    // correct as-of: the 11:00 row wins with v = null — the whole row,
    // not a mix of 11:00's timestamp and 09:00's value
    assert(row.getAs[Timestamp]("__r_ts") == ts("2024-01-01 11:00:00"))
    assert(row.isNullAt(row.fieldIndex("v")))
  }

  test("equal timestamps match, ties resolve to greatest tie column") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), 100L))
      .toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L), // equal ts — visible
      (1L, ts("2024-01-01 10:00:00"), 9L)) // tie → greatest click_id wins
      .toDF("user_id", "ts", "click_id")
    val got = AsOfJoin.asOf(left, right, "user_id", "ts", "click_id", Seq("click_id"))
      .collect().head.getAs[Long]("click_id")
    assert(got == 9L)
  }
}
