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

  /** Daily OHLC bars per event series — the downsampling step that
    * turns a raw tick/event stream into the bounded-size summary every
    * charting and forecasting layer consumes.
    *
    * Scale shape: ONE hash aggregation with map-side partials — open
    * and close are `min/max(struct(ts, event_id, cents))` so the
    * first/last observation is recovered inside the aggregate without
    * any window sort over the raw stream (a window would sort every
    * partition's full day of events; the struct-min carries exactly
    * one candidate per partial). `event_id` breaks same-microsecond
    * ties deterministically. All money is exact integer cents. */
  def ohlcBars(events: DataFrame): DataFrame = {
    val cents = floor(col("value") * 100).cast("long")
    events
      .select(col("event_type"), to_date(col("ts")).as("day"),
        col("ts"), col("event_id"), cents.as("cents"))
      .groupBy(col("event_type"), col("day"))
      .agg(
        min(struct(col("ts"), col("event_id"), col("cents"))).getField("cents").as("open_cents"),
        max(col("cents")).as("high_cents"),
        min(col("cents")).as("low_cents"),
        max(struct(col("ts"), col("event_id"), col("cents"))).getField("cents").as("close_cents"),
        count(lit(1)).as("n"),
        sum(col("cents")).as("volume_cents"))
      .orderBy(col("event_type"), col("day"))
  }

  /** CUSUM change-point per event series on the daily-count signal
    * (Page 1954): S_k = Σ_{i≤k}(n_i − mean), changepoint = argmax|S_k|.
    * Computed in EXACT integers by scaling through the series length:
    * days·S_k = days·cumsum_k − k·total — no double ever enters, so
    * the argmax (and ties, broken toward the earlier day) is
    * bit-deterministic across engines.
    *
    * Scale shape: the raw volume is touched once by the daily
    * count aggregation; the cumulative window and the argmax run over
    * ≤ (#series × #days) rows — calendar-bounded, not volume-bounded.
    * The per-series window partitions on event_type: fine while
    * #days per series is window-sortable (thousands), which a daily
    * grain guarantees for decades of data. */
  def cusumChangePoint(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val full = Window.partitionBy(col("event_type"))
    val scored = daily
      .select(col("event_type"), col("day"), col("n"),
        sum(col("n")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("cum"),
        row_number().over(w).as("k"),
        sum(col("n")).over(full).as("total"),
        count(lit(1)).over(full).as("days"))
      .select(col("event_type"), col("day"), col("days"),
        (col("days") * col("cum") - col("k") * col("total")).as("s_scaled"))
    scored
      .groupBy(col("event_type"))
      .agg(
        min(struct((-abs(col("s_scaled"))).as("na"), col("day"), col("s_scaled"))).as("best"),
        max(col("days")).as("days"))
      .select(col("event_type"),
        col("best.day").as("change_day"),
        col("best.s_scaled").as("s_scaled"),
        col("days"))
      .orderBy(col("event_type"))
  }

  /** Per-user EWMA (α = 1/2) over the event-value stream — the
    * smoothing primitive behind rate limiters, anomaly baselines and
    * engagement scores. A sequential recurrence (s_i depends on
    * s_{i-1}) looks driver-shaped, but per KEY it is an ordered fold:
    * ONE hash aggregation collects each user's (ts, event_id, value)
    * history, `sort_array` fixes the unique total order, and a
    * codegen'd `aggregate` lambda runs the fold row-locally — no
    * window sort over the raw stream, no driver loop, and the shuffle
    * moves each event exactly once.
    *
    * Determinism across engines: values enter as floor-micros longs and
    * the recurrence is integer — s_i = (s_{i-1} + v_i) div 2 — so no
    * floating addition ever happens in either engine. α = 1/2 also
    * means contributions decay by exactly one bit per step: the fold
    * forgets history ~64 events back, which is the practical EWMA
    * horizon anyway.
    *
    * Scale shape: per-key state is that user's own history (bounded by
    * per-user activity, not corpus size); a trillion-event log with
    * bounded per-user cardinality folds in one shuffle. For unbounded
    * keys you'd pre-window by recency — the recurrence telescopes, so
    * dropping a prefix only perturbs the result below the kept bits. */
  def ewmaByUser(events: DataFrame): DataFrame = {
    // Clamp at 0: Spark's `div` truncates toward zero while DuckDB's `//`
    // floors, and the two agree only on non-negative operands. events.value
    // is non-negative today; the clamp makes that a checked invariant in
    // BOTH engines rather than a comment.
    val vMicros = greatest(floor(col("value") * 1e6).cast("long"), lit(0L))
    events
      .select(col("user_id"),
        struct(col("ts"), col("event_id"), vMicros.as("v")).as("obs"))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(col("obs"))).as("seq"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("n_events"),
        expr("aggregate(transform(seq, x -> x.v), CAST(0 AS BIGINT)," +
          " (s, x) -> (s + x) div 2)").as("ewma_micros"))
      .orderBy(col("user_id"))
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
        |  CAST(last_value(d.total_cents IGNORE NULLS) OVER (
        |    PARTITION BY c.event_type ORDER BY c.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS filled_cents
        |FROM cal c LEFT JOIN daily d
        |  ON c.event_type = d.event_type AND c.day = d.day
        |ORDER BY 1, 2""".stripMargin),
      doc = "Daily gap-fill + forward-fill resample per event series"),

    Declared(
      "q144_ohlc",
      (s, dir) => ohlcBars(Tables.load(s, dir, "events")),
      Some("""WITH t AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, ts, event_id,
        |         CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY event_type, day ORDER BY ts, event_id) AS rn_a,
        |    row_number() OVER (PARTITION BY event_type, day ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM t)
        |SELECT event_type, day,
        |  max(CASE WHEN rn_a = 1 THEN cents END) AS open_cents,
        |  max(cents) AS high_cents,
        |  min(cents) AS low_cents,
        |  max(CASE WHEN rn_d = 1 THEN cents END) AS close_cents,
        |  count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS volume_cents
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      doc = "Daily OHLC bars per event series (single struct-min/max aggregation, no window sort)"),

    Declared(
      "q145_cusum",
      (s, dir) => cusumChangePoint(Tables.load(s, dir, "events")),
      Some("""WITH d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |sc AS (
        |  SELECT event_type, day,
        |    count(*) OVER (PARTITION BY event_type)
        |      * sum(n) OVER (PARTITION BY event_type ORDER BY day
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - row_number() OVER (PARTITION BY event_type ORDER BY day)
        |        * sum(n) OVER (PARTITION BY event_type) AS s_scaled,
        |    count(*) OVER (PARTITION BY event_type) AS days
        |  FROM d),
        |rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type
        |              ORDER BY abs(s_scaled) DESC, day) AS rn
        |  FROM sc)
        |SELECT event_type, day AS change_day,
        |  CAST(s_scaled AS BIGINT) AS s_scaled, days
        |FROM rk WHERE rn = 1 ORDER BY event_type""".stripMargin),
      doc = "CUSUM change-point per event series in exact scaled integers (argmax |days*cum - k*total|)"),

    Declared(
      "q158_ewma",
      (s, dir) => ewmaByUser(Tables.load(s, dir, "events")),
      // list_reduce has no explicit zero — prepend it; the greatest(,0)
      // clamp (mirrored in the Spark plan) keeps operands non-negative,
      // where DuckDB's floor-div // and Spark's truncating `div` agree.
      Some("""WITH e AS (
        |  SELECT user_id, ts, event_id,
        |         greatest(CAST(floor(value * 1e6) AS BIGINT), 0) AS v
        |  FROM events),
        |l AS (
        |  SELECT user_id, count(*) AS n_events,
        |         list(v ORDER BY ts, event_id) AS vs
        |  FROM e GROUP BY 1)
        |SELECT user_id, n_events,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), vs),
        |              (s, x) -> (s + x) // 2) AS ewma_micros
        |FROM l ORDER BY user_id""".stripMargin),
      doc = "Per-user EWMA (α=1/2) as a distributed ordered fold — integer recurrence, no window sort, no driver loop")
  )
}
