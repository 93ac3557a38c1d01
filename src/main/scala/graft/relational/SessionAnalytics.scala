package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Declared, Tables}

/** Interval analytics over sessionized event logs — the
  * "concurrent users" curve every capacity dashboard draws.
  *
  * The load-bearing design point: a session is an INTERVAL, and the
  * concurrency question ("how many sessions cover hour h?") is an
  * interval/point overlap join. The naive form is a range self-join
  * (every session × every hour — quadratic); the scalable form here
  * expands each session IN PLACE into the hour buckets it spans
  * (`sequence` + `explode`, bounded by session duration ÷ 1 h, a small
  * constant for gap-bounded sessions) and then runs one hash-agg on the
  * bucket. No join at all: shuffle #1 is the per-user sessionize
  * window, shuffle #2 the per-hour agg — both on natural keys, both
  * partial-aggregated map-side. At 100 TB of events this is the only
  * shape that survives: work is O(events + session-hours), never
  * O(sessions × hours).
  *
  * Gap sessionization mirrors the reference's session semantics
  * (`testdatascalability.py`-era event streams; same 30-min gap rule as
  * q23's session windows) via lag + running sum — the standard
  * island-detection idiom. */
object SessionAnalytics {

  /** Sessions as intervals: (user_id, sid, s_start, s_end) with a
    * `gapSec` inactivity split. One window + one agg, both keyed by
    * user_id. */
  def sessions(events: DataFrame, gapSec: Long = 1800L): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_s",
        when(col("prev_us").isNull
          || unix_micros(col("ts")) - col("prev_us") > gapSec * 1000000L, 1)
          .otherwise(0))
      .withColumn("sid", sum(col("new_s"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("ts")).as("s_start"), max(col("ts")).as("s_end"))
  }

  /** Hourly concurrency curve: per hour bucket, how many sessions cover
    * it and how many distinct users are active. */
  def concurrency(events: DataFrame, gapSec: Long = 1800L): DataFrame =
    sessions(events, gapSec)
      .select(col("user_id"),
        explode(sequence(date_trunc("hour", col("s_start")),
          date_trunc("hour", col("s_end")),
          expr("interval 1 hour"))).as("hour"))
      .groupBy(col("hour"))
      .agg(count(lit(1)).as("n_sessions"),
        count_distinct(col("user_id")).as("n_users"))
      .orderBy(col("hour"))

  val declared: Seq[Declared] = Seq(
    Declared(
      "q96_concurrency",
      (s, dir) => concurrency(Tables.load(s, dir, "events")),
      Some("""WITH o AS (
        |  SELECT user_id, event_id, ts,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |f AS (
        |  SELECT user_id, event_id, ts,
        |         CASE WHEN prev IS NULL OR ts - prev > INTERVAL 1800 SECOND
        |              THEN 1 ELSE 0 END AS new_s
        |  FROM o),
        |s AS (
        |  SELECT user_id, ts,
        |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                          ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM f),
        |g AS (
        |  SELECT user_id, sid, min(ts) AS s_start, max(ts) AS s_end
        |  FROM s GROUP BY user_id, sid),
        |h AS (
        |  SELECT user_id,
        |         unnest(generate_series(date_trunc('hour', s_start),
        |                                date_trunc('hour', s_end),
        |                                INTERVAL 1 HOUR)) AS hour
        |  FROM g)
        |SELECT hour, count(*) AS n_sessions,
        |       count(DISTINCT user_id) AS n_users
        |FROM h GROUP BY hour ORDER BY hour""".stripMargin),
      doc = "Hourly concurrent sessions/users via in-place interval expansion (no self-join)")
  )
}
