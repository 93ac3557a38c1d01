package graft.relational

import java.sql.Timestamp

import graft.SparkSpec

class SessionAnalyticsSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("concurrency: hand-crafted sessions, hour spans, gap boundary") {
    import spark.implicits._
    val events = Seq(
      // user 1: two events 15 min apart (one session), then a 50-min
      // gap (new session in the next hour)
      (1L, 1L, ts("2024-01-01 00:05:00")),
      (2L, 1L, ts("2024-01-01 00:20:00")),
      (3L, 1L, ts("2024-01-01 01:10:00")),
      // user 2: single event
      (4L, 2L, ts("2024-01-01 00:50:00")),
      // user 3: session straddling the hour boundary (00:55 → 01:05)
      (5L, 3L, ts("2024-01-01 00:55:00")),
      (6L, 3L, ts("2024-01-01 01:05:00")),
      // user 4: gap of EXACTLY 30 min — strict >, so same session
      (7L, 4L, ts("2024-01-01 02:00:00")),
      (8L, 4L, ts("2024-01-01 02:30:00")))
      .toDF("event_id", "user_id", "ts")

    val sess = SessionAnalytics.sessions(events).collect()
    assert(sess.length == 5) // u1×2, u2×1, u3×1, u4×1

    val byHour = SessionAnalytics.concurrency(events).collect()
      .map(r => r.getTimestamp(0).toString -> (r.getLong(1), r.getLong(2)))
      .toMap
    // hour 00: u1-s1, u2, u3 (starts 00:55) = 3 sessions / 3 users
    assert(byHour("2024-01-01 00:00:00.0") == ((3L, 3L)))
    // hour 01: u1-s2 + u3 (spans into 01) = 2 sessions / 2 users
    assert(byHour("2024-01-01 01:00:00.0") == ((2L, 2L)))
    // hour 02: u4's single merged session (exact-30-min gap not split)
    assert(byHour("2024-01-01 02:00:00.0") == ((1L, 1L)))
    assert(byHour.size == 3)
  }
}
