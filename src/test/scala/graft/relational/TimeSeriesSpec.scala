package graft.relational

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  /** events-shaped frame from (type, day-string, value). */
  private def eventsOf(rows: Seq[(String, String, Double)]) =
    rows.zipWithIndex
      .map { case ((t, d, v), i) => (i.toLong, t, d, v) }
      .toDF("event_id", "event_type", "d", "value")
      .withColumn("ts", to_timestamp(col("d")))
      .withColumn("user_id", lit(1L))
      .drop("d")

  test("gap days appear with n=0, observed=false, carried-forward total") {
    val out = TimeSeries.gapFillDaily(eventsOf(Seq(
      ("click", "2024-01-01", 2.00), // 200 cents
      ("click", "2024-01-01", 1.50), // +150 → day total 350
      ("click", "2024-01-04", 0.10)  // 10 cents after a 2-day gap
    ))).collect()
    assert(out.length == 4) // 01..04 inclusive
    val byDay = out.map(r => r.getDate(1).toString ->
      ((r.getLong(2), r.getBoolean(3), r.getLong(4)))).toMap
    assert(byDay("2024-01-01") == ((2L, true, 350L)))
    assert(byDay("2024-01-02") == ((0L, false, 350L))) // gap: ffill
    assert(byDay("2024-01-03") == ((0L, false, 350L)))
    assert(byDay("2024-01-04") == ((1L, true, 10L)))
  }

  test("each series spans its own [first, last] day, not the global one") {
    val out = TimeSeries.gapFillDaily(eventsOf(Seq(
      ("a", "2024-01-01", 1.0), ("a", "2024-01-03", 1.0),
      ("b", "2024-02-10", 1.0)
    ))).collect()
    val a = out.filter(_.getString(0) == "a")
    val b = out.filter(_.getString(0) == "b")
    assert(a.length == 3 && b.length == 1)
    assert(b.head.getDate(1).toString == "2024-02-10")
  }

  test("forward fill never reaches backwards (first day always observed)") {
    val out = TimeSeries.gapFillDaily(eventsOf(Seq(
      ("x", "2024-03-05", 7.0), ("x", "2024-03-07", 9.0)
    ))).collect()
    assert(out.head.getBoolean(3)) // min day is observed by construction
    assert(out.map(_.getLong(4)).toSeq == Seq(700L, 700L, 900L))
  }

  test("ohlcBars: open/close by time, high/low by value, exact cents") {
    val out = TimeSeries.ohlcBars(eventsOf(Seq(
      ("t", "2024-01-01 10:00:00", 1.00),
      ("t", "2024-01-01 09:00:00", 3.00), // earliest → open
      ("t", "2024-01-01 11:00:00", 2.00), // latest → close
      ("t", "2024-01-02 08:00:00", 5.00)  // second bar
    ))).collect()
    assert(out.length == 2)
    val d1 = out.head
    // (event_type, day, open, high, low, close, n, volume)
    assert((d1.getLong(2), d1.getLong(3), d1.getLong(4), d1.getLong(5),
      d1.getLong(6), d1.getLong(7)) == ((300L, 300L, 100L, 200L, 3L, 600L)))
    val d2 = out(1)
    assert((d2.getLong(2), d2.getLong(5), d2.getLong(6)) == ((500L, 500L, 1L)))
  }

  test("ohlcBars: same-timestamp ties break by event_id") {
    // eventsOf assigns event_id by list position: first row wins open
    val out = TimeSeries.ohlcBars(eventsOf(Seq(
      ("t", "2024-01-01 10:00:00", 5.0), // event_id 0 → open
      ("t", "2024-01-01 10:00:00", 7.0)  // event_id 1 → close
    ))).collect()
    assert(out.length == 1)
    assert((out.head.getLong(2), out.head.getLong(5)) == ((500L, 700L)))
  }

  test("cusumChangePoint: level shift found at the pre-shift peak") {
    // counts 1,1,5,5 → days=4, total=12; S_scaled = 4*cum - k*12:
    // -8, -16, -8, 0 → max |S| at day 2 (the last pre-shift day)
    val rows = Seq.tabulate(1)(_ => ("s", "2024-01-01", 1.0)) ++
      Seq.tabulate(1)(_ => ("s", "2024-01-02", 1.0)) ++
      Seq.tabulate(5)(_ => ("s", "2024-01-03", 1.0)) ++
      Seq.tabulate(5)(_ => ("s", "2024-01-04", 1.0))
    val out = TimeSeries.cusumChangePoint(eventsOf(rows)).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getDate(1).toString == "2024-01-02")
    assert(r.getLong(2) == -16L)
    assert(r.getLong(3) == 4L)
  }

  test("cusumChangePoint: flat series ties break to the earliest day") {
    val out = TimeSeries.cusumChangePoint(eventsOf(Seq(
      ("f", "2024-01-01", 1.0), ("f", "2024-01-01", 1.0),
      ("f", "2024-01-02", 1.0), ("f", "2024-01-02", 1.0)
    ))).collect()
    assert(out.head.getDate(1).toString == "2024-01-01")
    assert(out.head.getLong(2) == 0L)
  }

  /** events frame with explicit user ids and second-offset timestamps. */
  private def userEvents(rows: Seq[(Long, Int, Double)]) = {
    import spark.implicits._
    rows.zipWithIndex
      .map { case ((u, sec, v), i) => (i.toLong, u, sec, v) }
      .toDF("event_id", "user_id", "sec", "value")
      .withColumn("ts", timestamp_seconds(lit(1704067200L) + col("sec")))
      .drop("sec")
  }

  test("ewmaByUser: hand-computed integer fold (s_i = (s_{i-1}+v_i) div 2)") {
    val out = TimeSeries.ewmaByUser(userEvents(Seq(
      (1L, 0, 7.0),   // s1 = (0 + 7_000_000) div 2 = 3_500_000
      (1L, 1, 9.0),   // s2 = (3_500_000 + 9_000_000) div 2 = 6_250_000
      (2L, 0, 1.0)    // s1 = 500_000
    ))).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L, 6250000L), (2L, 1L, 500000L)))
  }

  test("ewmaByUser: fold order is (ts, event_id), not input row order") {
    // same user, rows supplied in reverse time order; the result must
    // equal the time-ordered fold
    val shuffled = TimeSeries.ewmaByUser(userEvents(Seq(
      (1L, 2, 4.0), (1L, 0, 7.0), (1L, 1, 9.0)
    ))).collect().head.getLong(2)
    // (0+7e6)/2=3.5e6 → (3.5e6+9e6)/2=6.25e6 → (6.25e6+4e6)/2=5_125_000
    assert(shuffled == 5125000L)
  }

  test("ewmaByUser: repartition-invariant (deterministic distributed fold)") {
    val e = graft.Tables.load(spark, sf0001, "events")
    val a = TimeSeries.ewmaByUser(e).collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    val b = TimeSeries.ewmaByUser(e.repartition(7)).collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(a == b)
  }
}
