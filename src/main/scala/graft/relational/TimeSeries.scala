package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Declared, Tables}

/** Time-series regularization — the resample step every downstream
  * model/dashboard assumes has already happened: an event log is
  * irregular (days with zero events simply don't appear), so metrics
  * computed directly over it silently skip gaps. `gapFillDaily`
  * produces one row per (series, calendar day) over each series' own
  * span — zero-filled counts, and the last observed daily total
  * carried forward (the standard forward-fill for slowly-moving
  * level metrics).
  *
  * Scale shape: the raw volume is touched exactly once (the daily
  * pre-aggregation, a map-side-combinable count/sum keyed by
  * (series, day)). Everything after — calendar generation, the left
  * join, the forward-fill window — runs over at most
  * (#series × #days) aggregated rows, which is bounded by the time
  * span, not the event volume: at 100 TB of events it is the same
  * few thousand rows as at sf0.01. Money sums are exact integer
  * cents (floor of an identical double product is bit-deterministic
  * across engines; long addition is shuffle-order-independent).
  */
object TimeSeries {

  /** Per event_type daily resample over the type's [first, last] day:
    * n (0 on gap days), observed flag, and forward-filled daily
    * total in cents. */
  def gapFillDaily(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 100).cast("long")).as("total_cents"))
    val calendar = daily
      .groupBy(col("event_type"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("event_type"), explode(sequence(col("d0"), col("d1"))).as("day"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    calendar
      .join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("n"), lit(0L)).as("n"),
        col("total_cents").isNotNull.as("observed"),
        last(col("total_cents"), ignoreNulls = true).over(w).as("filled_cents"))
      .orderBy(col("event_type"), col("day"))
  }

  val declared: Seq[Declared] = Seq(
    Declared(
      "q132_gap_fill",
      (s, dir) => gapFillDaily(Tables.load(s, dir, "events")),
      Some("""WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n,
        |         sum(CAST(floor(value * 100) AS BIGINT)) AS total_cents
        |  FROM events GROUP BY 1, 2),
        |cal AS (
        |  SELECT event_type,
        |         CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM (SELECT event_type, min(day) AS d0, max(day) AS d1
        |        FROM daily GROUP BY 1))
        |SELECT c.event_type, c.day,
        |  CAST(coalesce(d.n, 0) AS BIGINT) AS n,
        |  d.total_cents IS NOT NULL AS observed,
        |  last_value(d.total_cents IGNORE NULLS) OVER (
        |    PARTITION BY c.event_type ORDER BY c.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_cents
        |FROM cal c LEFT JOIN daily d
        |  ON c.event_type = d.event_type AND c.day = d.day
        |ORDER BY 1, 2""".stripMargin),
      doc = "Daily gap-fill + forward-fill resample per event series")
  )
}
