package graft.relational

import java.sql.Timestamp

import graft.SparkSpec

class ChangeDataSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("upsertCompact: latest wins, tombstone deletes, base-only survives") {
    import spark.implicits._
    val base = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0),
      (2L, ts("2024-01-01 10:00:00"), 10L, "view", 1.0),
      (3L, ts("2024-01-01 10:00:00"), 20L, "view", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .select("user_id", "ts", "event_id", "event_type", "value")
    val changes = Seq(
      // user 10: newer update wins over base
      (4L, ts("2024-01-02 10:00:00"), 10L, "click", 2.0),
      // user 20: tombstone (value < 0.1) deletes the key
      (5L, ts("2024-01-02 10:00:00"), 20L, "click", 0.01))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .select("user_id", "ts", "event_id", "event_type", "value")
    val out = ChangeData.upsertCompact(base, changes).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3))).toSet
    assert(out == Set((1L, 1L, "view"), (10L, 4L, "click")))
  }

  test("upsertCompact: an older tombstone does not delete a newer update") {
    import spark.implicits._
    val base = Seq((10L, ts("2024-01-03 10:00:00"), 7L, "view", 1.0))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val changes = Seq((10L, ts("2024-01-02 10:00:00"), 6L, "click", 0.01))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val out = ChangeData.upsertCompact(base, changes).collect()
    assert(out.length == 1 && out.head.getLong(1) == 7L)
  }

  test("scd2Intervals: runs collapse, intervals chain, current is open") {
    import spark.implicits._
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 5L, "view"),
      (2L, ts("2024-01-01 11:00:00"), 5L, "view"),
      (3L, ts("2024-01-01 12:00:00"), 5L, "click"),
      (4L, ts("2024-01-01 13:00:00"), 5L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = ChangeData.scd2Intervals(events).collect()
      .map(r => (r.getLong(1), r.getString(2),
        r.getTimestamp(3), Option(r.getTimestamp(4)), r.getLong(5)))
    assert(out.length == 3)
    assert(out(0) == (1L, "view", ts("2024-01-01 10:00:00"),
      Some(ts("2024-01-01 12:00:00")), 2L))
    assert(out(1) == (2L, "click", ts("2024-01-01 12:00:00"),
      Some(ts("2024-01-01 13:00:00")), 1L))
    assert(out(2) == (3L, "view", ts("2024-01-01 13:00:00"), None, 1L))
  }
}
