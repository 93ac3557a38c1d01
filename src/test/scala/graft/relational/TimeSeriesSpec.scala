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
}
