package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Declared, Tables}

/** Event-log analytics — the product-analytics staples over the
  * `events` stream table, all per-user windows/aggregations that
  * partition by `user_id` (the natural shuffle key; no global
  * serialization point at any event volume):
  *
  *  - throttle/debounce dedup: drop an event when the SAME (user,
  *    type) fired within the preceding `gapSec` — the log-cleaning
  *    step before any funnel/retention read (double-clicks, retry
  *    storms, at-least-once delivery);
  *  - conversion funnel with strict temporal ordering (first view →
  *    first click after it → first purchase after that), not the
  *    naive type-count funnel that overcounts out-of-order journeys;
  *  - day-0 cohort retention: users grouped by first-activity day,
  *    counted on each later active day offset — the triangle every
  *    growth dashboard draws.
  */
object EventAnalytics {

  /** Debounce: keep an event iff the previous same-(user, type) event
    * (by (ts, event_id) order) is absent or more than `gapSec` older.
    * One lag window per (user, type) partition. */
  def throttleDedup(events: DataFrame, gapSec: Long = 300L): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .filter(col("prev_us").isNull
        || unix_micros(col("ts")) - col("prev_us") > gapSec * 1000000L)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      .orderBy(col("event_id"))
  }

  /** Strictly-ordered view → click → purchase funnel: per-stage user
    * counts and conversion rates. Stage n's timestamp must be LATER
    * than stage n−1's first attainment. Three per-user aggs + two
    * broadcast-size joins on user_id. */
  def funnel(events: DataFrame): DataFrame = {
    val v = events.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
    val c = events.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("ts") > col("t_view"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
    val p = events.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("ts") > col("t_click"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
    // one row of three scalar counts (each a partial-agg'd count), then
    // the three funnel rows unpivot from it — no driver action anywhere
    v.agg(count(lit(1)).as("nv"))
      .crossJoin(c.agg(count(lit(1)).as("nc")))
      .crossJoin(p.agg(count(lit(1)).as("np")))
      .select(explode(array(
        struct(lit(1).as("stage"), lit("view").as("step"),
          col("nv").as("n_users"), lit(1.0).as("conversion")),
        struct(lit(2).as("stage"), lit("click_after_view").as("step"),
          col("nc").as("n_users"),
          round(col("nc").cast("double") / col("nv"), 4).as("conversion")),
        struct(lit(3).as("stage"), lit("purchase_after_click").as("step"),
          col("np").as("n_users"),
          round(col("np").cast("double") / col("nc"), 4).as("conversion"))))
        .as("r"))
      .select(col("r.stage"), col("r.step"), col("r.n_users"), col("r.conversion"))
      .orderBy(col("stage"))
  }

  /** Cohort retention triangle: users keyed by first-activity DAY,
    * counted distinct on each active day offset. Output is one row per
    * (cohort_day, day_offset) — ≤ days² rows regardless of volume. */
  def retention(events: DataFrame): DataFrame = {
    val firstDay = events.groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("cohort_day"))
    events.select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
      .join(firstDay, Seq("user_id"))
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("day_offset"))
      .agg(count_distinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** Event-type transition matrix: per-user consecutive event bigrams
    * (lead over the (ts, event_id)-ordered per-user stream) counted per
    * (from, to) pair, with the row-normalized transition probability.
    * The lead window shuffles once on user_id (the natural key); the
    * probability window runs over the ≤ |types|² aggregated rows. The
    * single division of two exact counts makes the double
    * engine-identical. */
  def transitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", round(col("n").cast("double")
        / sum(col("n")).over(Window.partitionBy(col("from_type"))), 4))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Per-type daily-volume anomaly flags: z-score of each (type, day)
    * event count against that type's across-days mean/stddev. The
    * moments come from exact integer sums (count, Σn, Σn²) so both
    * engines evaluate the identical closed form — no library stddev
    * accumulation-order drift (q42's idiom). Output is one row per
    * (type, day) — ≤ types × days rows at any event volume; the stats
    * side is ≤ |types| rows, broadcast. */
  def volumeAnomaly(events: DataFrame, zThresh: Double = 2.0): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val stats = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("days"), sum(col("n")).as("s"),
        sum(col("n") * col("n")).as("ss"))
      .filter(col("days") > 1)
    daily.join(broadcast(stats), Seq("event_type"))
      .withColumn("sd", sqrt((col("ss").cast("double")
        - col("s").cast("double") * col("s").cast("double") / col("days"))
        / (col("days") - 1)))
      .filter(col("sd") > 0)
      .withColumn("z", round((col("n").cast("double")
        - col("s").cast("double") / col("days")) / col("sd"), 4))
      .select(col("event_type"), col("day"), col("n"), col("z"),
        (abs(col("z")) >= zThresh).as("is_anomaly"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Daily activity with 7-day rolling volume: DAU, event count, and
    * the trailing-week event sum/avg per day. The rolling window runs
    * over the ≤ #days aggregated rows (one row per day), not the event
    * stream — same tiny-input global-window pattern as q71. */
  def dailyActive(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count_distinct(col("user_id")).as("dau"),
        count(lit(1)).as("n_events"))
    val w = Window.orderBy(col("day")).rowsBetween(-6, 0)
    daily
      .withColumn("events_7d", sum(col("n_events")).over(w))
      .withColumn("avg_7d", round(avg(col("n_events")).over(w), 4))
      .orderBy(col("day"))
  }

  /** Incremental view maintenance — the nightly-ETL contract at 100 TB:
    * closed days NEVER rescan. The history partial aggregate is a
    * materialized parquet snapshot (built once, here via
    * [[graft.Materialized]]); each refresh aggregates ONLY the fresh
    * slice (`ts ≥ cutover`, a raw timestamp comparison so the scan
    * prunes on parquet stats) and unions it in. Counts and integer-cent
    * sums are decomposable aggregates, so snapshot + fresh ≡ full
    * recompute — which is exactly what the oracle states. */
  def incrementalDaily(s: SparkSession, dir: String,
                       cutover: String = "2024-01-24T00:00:00Z"): DataFrame = {
    // The rebuilt µs timestamp (Tables.load) is a DERIVED column — a
    // bound on it cannot reach the parquet scan. Push the cutover in
    // the file's raw NANOS domain instead (`ts div 1000 ≥ µs ⟺
    // ts ≥ µs·1000` exactly, integer division on non-negative nanos),
    // then rebuild. PlanSpecs asserts the scan receives the bound.
    val raw = s.read.parquet(s"$dir/events.parquet")
    val cutMicros = java.time.Instant.parse(cutover).toEpochMilli * 1000L
    def slice(fresh: Boolean): DataFrame =
      if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType) {
        val cutNanos = cutMicros * 1000L
        raw.filter(if (fresh) col("ts") >= cutNanos else col("ts") < cutNanos)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      } else {
        val cut = timestamp_micros(lit(cutMicros))
        Tables.load(s, dir, "events")
          .filter(if (fresh) col("ts") >= cut else col("ts") < cut)
      }
    def dailyAgg(df: DataFrame): DataFrame = df
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("v_cents"))
    val hist = graft.Materialized.table(s, dir, "daily_hist") {
      dailyAgg(slice(fresh = false))
    }
    hist.unionByName(dailyAgg(slice(fresh = true)))
      .select(col("day"), col("event_type"), col("n"),
        round(col("v_cents").cast("double") / 100, 2).as("value_sum"))
      .orderBy(col("day"), col("event_type"))
  }

  /** 7-day rolling distinct users via mergeable HLL sketches — the
    * sketch answer to "rolling MAU" at scale: the event stream
    * aggregates ONCE into a sketch per day (map-side combined,
    * order-independent registers ⇒ deterministic), and the rolling
    * union merges ≤ 7 sketches per output row instead of re-scanning
    * 7 days of raw events per day. The window runs over ≤ #days
    * aggregated rows (q79's pattern). DAU is exact; the 7-day estimate
    * is approximate ⇒ rows-only for the driver, accuracy-gated in the
    * spec against the exact rolling distinct. */
  def rollingDistinctUsers(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"),
        count_distinct(col("user_id")).as("dau"))
    val w = Window.orderBy(col("day")).rowsBetween(-6, 0)
    daily
      .withColumn("users_7d_est", hll_sketch_estimate(hll_union_agg(col("sk")).over(w)))
      .select(col("day"), col("dau"), col("users_7d_est"))
      .orderBy(col("day"))
  }

  /** [[rollingDistinctUsers]]' oracle-mirrorable twin — an HLL built
    * from first principles on the portable md5 hash (p = 6, m = 64
    * registers; bucket = top 6 hash bits, rho = leading-zero count of
    * the remaining 54 bits + 1 — computed EXACTLY via the binary-string
    * length, no log2), so every stage the library sketch performs is
    * replayed: per-day registers are a (day, bucket) max aggregation
    * (order-free ⇒ deterministic), the 7-day union is a register-wise
    * max over the window days, and the raw estimate α·m²/Σ2^(−reg) is
    * IEEE-exact (each 2^(−reg) is an exact double, the Σ a pinned
    * bucket-ordered fold). The small-range (linear-counting)
    * correction IS applied — floor(m·ln(m/V)) when the raw estimate is
    * ≤ 2.5m and V > 0 registers are empty — and is floor-stable because
    * the closest m·ln(m/V) comes to an integer boundary over V ∈ 1..63
    * is 0.0079 (checked exhaustively; see the inline comment below).
    * Only the large-range (2³²-scale) correction is omitted: it is
    * unreachable at these cardinalities and would add a second
    * transcendental (q111's library form applies both). */
  def rollingDistinctPortable(events: DataFrame): DataFrame = {
    val m = 64
    val twoP54 = 1L << 54
    val h = events.select(to_date(col("ts")).as("day"),
      conv(substring(md5(concat(lit("hll|"), col("user_id").cast("string"))),
        1, 15), 16, 10).cast("long").as("h"))
    val regs = h.select(col("day"), expr(s"h div $twoP54").as("b"),
        when(col("h") % twoP54 === 0L, lit(55L))
          .otherwise(lit(54L) - (length(bin(col("h") % twoP54)) - 1)).as("rho"))
      .groupBy(col("day"), col("b")).agg(max(col("rho")).as("rho"))
      .localCheckpoint() // feeds the day-range join twice below
    val days = regs.select(col("day")).distinct()
    val roll = days.as("d").join(regs.as("r"),
        col("r.day").between(date_sub(col("d.day"), 6), col("d.day")))
      .groupBy(col("d.day").as("day"), col("r.b").as("b"))
      .agg(max(col("r.rho")).as("rho"))
    val full = days.select(col("day"),
        explode(sequence(lit(0L), lit(m - 1L))).as("b"))
      .join(roll, Seq("day", "b"), "left")
      .select(col("day"), col("b"), coalesce(col("rho"), lit(0L)).as("rho"))
    // Small-range (linear-counting) correction, exactly as Flajolet et
    // al. prescribe: with V > 0 empty registers and a raw estimate
    // ≤ 2.5m, estimate m·ln(m/V) instead. The ln is the one
    // transcendental in the pipeline; V ranges over the finite set
    // 1..63, and the closest m·ln(m/V) comes to an integer boundary is
    // 0.0079 (checked exhaustively) — ten orders of magnitude beyond
    // any libm-vs-JVM last-ulp disagreement, so the floor is stable.
    val est = full.groupBy(col("day"))
      .agg(sort_array(collect_list(struct(col("b"), col("rho")))).as("rs"),
        sum(when(col("rho") === 0L, 1L).otherwise(0L)).as("v"))
      .select(col("day"), expr(
        s"0.709D * $m * $m / aggregate(rs, CAST(0 AS DOUBLE), " +
          "(acc, s) -> acc + 1.0D / CAST(shiftleft(CAST(1 AS BIGINT), " +
          "CAST(s.rho AS INT)) AS DOUBLE))").as("raw"), col("v"))
      .select(col("day"),
        when(col("raw") <= lit(2.5 * m) && col("v") > 0L,
          floor(lit(m.toDouble) * log(lit(m.toDouble) / col("v"))))
          .otherwise(floor(col("raw")))
          .cast("long").as("users_7d_est"))
    val dau = events.groupBy(to_date(col("ts")).as("day"))
      .agg(count_distinct(col("user_id")).as("dau"))
    est.join(dau, Seq("day"))
      .select(col("day"), col("dau"), col("users_7d_est"))
      .orderBy(col("day"))
  }

  private val hllPortableOracle: String =
    """WITH h AS MATERIALIZED (
      |  SELECT CAST(ts AS DATE) AS day,
      |    CAST(('0x' || substr(md5('hll|' || CAST(user_id AS VARCHAR)),
      |      1, 15)) AS BIGINT) AS h
      |  FROM events),
      |r AS MATERIALIZED (
      |  SELECT day, h // 18014398509481984 AS b,
      |    max(CASE WHEN h % 18014398509481984 = 0 THEN 55
      |         ELSE 54 - (length(bin(h % 18014398509481984)) - 1) END) AS rho
      |  FROM h GROUP BY 1, 2),
      |days AS (SELECT DISTINCT day FROM h),
      |roll AS (
      |  SELECT d.day, r.b, max(r.rho) AS rho
      |  FROM days d JOIN r ON r.day BETWEEN d.day - 6 AND d.day
      |  GROUP BY 1, 2),
      |f AS (
      |  SELECT d.day, t.b, coalesce(roll.rho, 0) AS rho
      |  FROM days d CROSS JOIN range(64) t(b)
      |  LEFT JOIN roll ON roll.day = d.day AND roll.b = t.b),
      |est0 AS (
      |  SELECT day,
      |    CAST(0.709 AS DOUBLE) * 64 * 64 / list_reduce(
      |      list_prepend(CAST(0 AS DOUBLE),
      |        list(CAST(1 AS DOUBLE) /
      |             CAST(CAST(1 AS BIGINT) << CAST(rho AS INT) AS DOUBLE)
      |             ORDER BY b)),
      |      (a, x) -> a + x) AS raw,
      |    sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS v
      |  FROM f GROUP BY day),
      |est AS (
      |  SELECT day,
      |    CAST(CASE WHEN raw <= CAST(160 AS DOUBLE) AND v > 0
      |         THEN floor(CAST(64 AS DOUBLE) * ln(CAST(64 AS DOUBLE) / v))
      |         ELSE floor(raw) END AS BIGINT) AS users_7d_est
      |  FROM est0),
      |dau AS (SELECT CAST(ts AS DATE) AS day, count(DISTINCT user_id) AS dau
      |        FROM events GROUP BY 1)
      |SELECT est.day, dau.dau, est.users_7d_est
      |FROM est JOIN dau USING (day) ORDER BY est.day""".stripMargin

  /** Portable bottom-k (KMV / "theta") sketches over per-event-type
    * distinct-user sets, with PAIRWISE INTERSECTION estimates — the
    * set operation an HLL union cannot answer (HLLs union; only theta-
    * style samples intersect). Build: one distinct on (type, 60-bit
    * md5 hash), then per-type bottom-k via a rank window (Spark plans
    * a WindowGroupLimit, so each map task keeps only k rows before the
    * shuffle — the same mergeable bottom-k shape as the
    * [[graft.agg.ReservoirSample]] family, declaratively). Estimators,
    * all cross-engine IEEE-exact (long→double conversion, one exact
    * product of a ≤ 8-significant-bit integer with 2⁶⁰, one correctly-
    * rounded division, floor):
    *  - per type: kact < k ⇒ the sketch IS the set, estimate = kact;
    *    else (k−1)·2⁶⁰ / θ with θ = the k-th smallest hash;
    *  - per pair: common hashes strictly below θ_min = min(θ_a, θ_b),
    *    estimate = n_common·2⁶⁰ / θ_min.
    * At 100 TB: sketches are k rows per type — intersection work is
    * driver-trivial after one distinct shuffle. */
  def thetaOverlap(events: DataFrame, k: Int = 128): DataFrame = {
    val twoP60 = 1152921504606846976L // 16^15, the md5-prefix hash space
    val h = events.select(col("event_type"),
        conv(substring(md5(concat(lit("theta|"), col("user_id").cast("string"))),
          1, 15), 16, 10).cast("long").as("h"))
      .distinct()
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
    val sk = h.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("event_type"), col("h"))
      .localCheckpoint() // feeds the estimate AND both sides of the pair join
    val est = sk.groupBy(col("event_type"))
      .agg(count(lit(1)).as("kact"), max(col("h")).as("maxh"))
      .select(col("event_type"),
        when(col("kact") >= k, col("maxh")).otherwise(lit(twoP60)).as("theta"),
        when(col("kact") >= k,
          floor(lit((k - 1).toDouble) * lit(twoP60.toDouble)
            / col("maxh").cast("double")).cast("long"))
          .otherwise(col("kact")).as("est"))
    val pairs = est.as("a").join(est.as("b"),
        col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"),
        col("a.est").as("est_a"), col("b.est").as("est_b"),
        least(col("a.theta"), col("b.theta")).as("tm"))
    val common = sk.as("x").join(sk.as("y"),
        col("x.h") === col("y.h") && col("x.event_type") < col("y.event_type"))
      .select(col("x.event_type").as("type_a"), col("y.event_type").as("type_b"),
        col("x.h").as("h"))
    pairs.join(common,
        pairs("type_a") === common("type_a") && pairs("type_b") === common("type_b")
          && common("h") < pairs("tm"), "left_outer")
      .groupBy(pairs("type_a"), pairs("type_b"), col("est_a"), col("est_b"), col("tm"))
      .agg(count(common("h")).as("n_common"))
      .select(col("type_a"), col("type_b"), col("est_a"), col("est_b"),
        col("n_common"),
        floor(col("n_common").cast("double") * lit(twoP60.toDouble)
          / col("tm").cast("double")).cast("long").as("est_common"))
      .orderBy(col("type_a"), col("type_b"))
  }

  private def thetaOracle(k: Int): String =
    s"""WITH h AS MATERIALIZED (
       |  SELECT DISTINCT event_type,
       |    CAST(('0x' || substr(md5('theta|' || CAST(user_id AS VARCHAR)),
       |      1, 15)) AS BIGINT) AS h
       |  FROM events),
       |r AS MATERIALIZED (
       |  SELECT event_type, h,
       |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
       |  FROM h),
       |sk AS MATERIALIZED (SELECT event_type, h FROM r WHERE rn <= $k),
       |est AS MATERIALIZED (
       |  SELECT event_type,
       |    CASE WHEN count(*) >= $k THEN max(h)
       |         ELSE 1152921504606846976 END AS theta,
       |    CASE WHEN count(*) >= $k
       |         THEN CAST(floor(CAST(${k - 1} AS DOUBLE)
       |                * CAST(1152921504606846976 AS DOUBLE)
       |                / CAST(max(h) AS DOUBLE)) AS BIGINT)
       |         ELSE count(*) END AS est
       |  FROM sk GROUP BY 1),
       |pairs AS (
       |  SELECT a.event_type AS type_a, b.event_type AS type_b,
       |    a.est AS est_a, b.est AS est_b, least(a.theta, b.theta) AS tm
       |  FROM est a JOIN est b ON a.event_type < b.event_type),
       |cm AS (
       |  SELECT x.event_type AS type_a, y.event_type AS type_b, x.h
       |  FROM sk x JOIN sk y ON x.h = y.h AND x.event_type < y.event_type),
       |cnt AS (
       |  SELECT p.type_a, p.type_b, p.est_a, p.est_b, p.tm,
       |    count(c.h) AS n_common
       |  FROM pairs p LEFT JOIN cm c
       |    ON c.type_a = p.type_a AND c.type_b = p.type_b AND c.h < p.tm
       |  GROUP BY 1, 2, 3, 4, 5)
       |SELECT type_a, type_b, est_a, est_b,
       |  CAST(n_common AS BIGINT) AS n_common,
       |  CAST(floor(CAST(n_common AS DOUBLE)
       |    * CAST(1152921504606846976 AS DOUBLE)
       |    / CAST(tm AS DOUBLE)) AS BIGINT) AS est_common
       |FROM cnt ORDER BY type_a, type_b""".stripMargin

  /** Portable mergeable QUANTILE sketch — per-event-type p50/p90/p99 of
    * `value` estimated from a deterministic bottom-k uniform ROW sample
    * (md5 rank on event_id, the KMV idiom: mergeable map-side, order-
    * independent, identical on any partitioning), with NEAREST-RANK
    * selection on the sample. Unlike percentile_approx (JVM-internal
    * GK sketch, rows-only forever), every stage here is portable and
    * the estimator does no floating-point arithmetic at all: the
    * quantile is the sample element at integer index ⌈p·m⌉ computed as
    * `(a·m + b − 1) div b`, ties broken by event_id — so the oracle
    * replays the whole sketch exactly. Completes the portable sketch
    * family: membership (Bloom), frequency (CMS), cardinality (HLL),
    * intersection (theta), heavy hitters (space-saving), integrity
    * (Merkle), and now rank/quantile. */
  def quantileSketch(events: DataFrame, k: Int = 256): DataFrame = {
    val h = events.select(col("event_type"), col("value"), col("event_id"),
      conv(substring(md5(concat(lit("q|"), col("event_id").cast("string"))),
        1, 15), 16, 10).cast("long").as("h"))
    val wB = Window.partitionBy(col("event_type")).orderBy(col("h"), col("event_id"))
    val sk = h.withColumn("rn", row_number().over(wB)).filter(col("rn") <= k)
      .select(col("event_type"), col("value"), col("event_id"))
    val wV = Window.partitionBy(col("event_type")).orderBy(col("value"), col("event_id"))
    sk.withColumn("vr", row_number().over(wV))
      .withColumn("m", count(lit(1)).over(Window.partitionBy(col("event_type"))))
      .groupBy(col("event_type"), col("m"))
      .agg(
        max(when(col("vr") === expr("(m + 1) div 2"), col("value"))).as("p50"),
        max(when(col("vr") === expr("(m * 9 + 9) div 10"), col("value"))).as("p90"),
        max(when(col("vr") === expr("(m * 99 + 99) div 100"), col("value"))).as("p99"))
      // The selected quantiles are RAW sample values (no rounding):
      // each is a parquet double both engines read bit-identically, so
      // any round() here would only reintroduce a cross-engine
      // HALF_UP-vs-banker's tie hazard on the 7th digit (round-8
      // advice) without adding information.
      .select(col("event_type"), col("m").as("n_sample"),
        col("p50"), col("p90"), col("p99"))
      .orderBy(col("event_type"))
  }

  private def quantileOracle(k: Int): String =
    s"""WITH h AS (
       |  SELECT event_type, value, event_id,
       |    CAST(('0x' || substr(md5('q|' || CAST(event_id AS VARCHAR)),
       |      1, 15)) AS BIGINT) AS h
       |  FROM events),
       |r AS (
       |  SELECT event_type, value, event_id,
       |    row_number() OVER (PARTITION BY event_type ORDER BY h, event_id) AS rn
       |  FROM h),
       |sk AS MATERIALIZED (
       |  SELECT event_type, value, event_id FROM r WHERE rn <= $k),
       |o AS (
       |  SELECT event_type, value,
       |    row_number() OVER (PARTITION BY event_type
       |                       ORDER BY value, event_id) AS vr,
       |    count(*) OVER (PARTITION BY event_type) AS m
       |  FROM sk)
       |SELECT event_type, CAST(m AS BIGINT) AS n_sample,
       |  max(CASE WHEN vr = (m + 1) // 2 THEN value END) AS p50,
       |  max(CASE WHEN vr = (m * 9 + 9) // 10 THEN value END) AS p90,
       |  max(CASE WHEN vr = (m * 99 + 99) // 100 THEN value END) AS p99
       |FROM o GROUP BY event_type, m ORDER BY event_type""".stripMargin

  /** A/B-test readout — the experimentation query a product pipeline
    * runs daily: FIRST-TOUCH variant assignment (the k prop of each
    * user's earliest event, by (ts, event_id) — one `min(struct(...))`
    * hash aggregate, no window), purchase conversion per variant, and
    * the pooled two-proportion z statistic, computed in one closed-form
    * expression from four exact integers so both engines evaluate the
    * identical double. One shuffle on user_id; the variant summary is
    * two rows. */
  def abTest(events: DataFrame, windowHours: Int = 24): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("long")
    val firsts = events
      .select(col("user_id"), struct(col("ts"), col("event_id"), k.as("k")).as("e"))
      .groupBy(col("user_id"))
      .agg(min(col("e")).as("first"))
    // conversion = a purchase within the attribution window after first
    // touch; the events ⋈ firsts join and the per-user aggregate share
    // one user_id shuffle lineage
    val assigned = events
      .select(col("user_id"), col("ts"), col("event_type"))
      .join(firsts, Seq("user_id"))
      .groupBy(col("user_id"))
      .agg(first(
        when(pmod(col("first.k"), lit(2L)) === 0L, "A").otherwise("B"))
        .as("variant"),
        max(col("event_type") === "purchase"
          && col("ts") <= col("first.ts") + expr(s"interval $windowHours hours"))
          .as("converted"))
    val stats = assigned.groupBy(col("variant"))
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("converted"), 1L).otherwise(0L)).as("n_converted"))
    val wide = stats.agg(
      sum(when(col("variant") === "A", col("n_users"))).as("na"),
      sum(when(col("variant") === "A", col("n_converted"))).as("ca"),
      sum(when(col("variant") === "B", col("n_users"))).as("nb"),
      sum(when(col("variant") === "B", col("n_converted"))).as("cb"))
    val p = (col("ca") + col("cb")).cast("double") / (col("na") + col("nb"))
    val denom = sqrt(p * (lit(1.0) - p)
      * (lit(1.0) / col("na") + lit(1.0) / col("nb")))
    wide.select(col("na"), col("ca"),
        round(col("ca").cast("double") / col("na"), 6).as("rate_a"),
        col("nb"), col("cb"),
        round(col("cb").cast("double") / col("nb"), 6).as("rate_b"),
        // guarded: p = 0 or 1 makes the pooled variance 0 (ANSI errors
        // on the division); a degenerate experiment reports NULL z
        when(denom > 0, round((col("ca").cast("double") / col("na")
          - col("cb").cast("double") / col("nb")) / denom, 6)).as("z"))
  }

  /** Top event-type trigrams across user journeys — the sequence-mining
    * read ("what do users actually do, in order") behind navigation and
    * drop-off analysis. Consecutive-triple extraction is two lead()
    * calls on the per-user (ts, event_id) order; everything after runs
    * on the (|types|³-bounded) path vocabulary.
    *
    * Scale shape: one shuffle on user_id for the window (per-user
    * partitions are user-activity-sized, never corpus-sized), one
    * map-combinable count aggregation, and a WindowGroupLimit-free
    * global top-k (ORDER BY + LIMIT over ≤ |types|³ aggregated rows). */
  def eventPaths(events: DataFrame, k: Int = 10): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("event_type").as("e1"),
        lead(col("event_type"), 1).over(w).as("e2"),
        lead(col("event_type"), 2).over(w).as("e3"))
      .filter(col("e3").isNotNull)
      .groupBy(col("e1"), col("e2"), col("e3"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("n").desc, col("e1"), col("e2"), col("e3"))
      .limit(k)
  }

  /** Winsorized per-type value stats: clamp cents into
    * [floor(p05), ceil(p95)] and report the robust mean next to the raw
    * one — the outlier-resistant aggregate a metrics layer publishes.
    * The interpolated percentile is computed once per type (exact
    * percentile over integer cents — matches DuckDB's quantile_cont
    * bit-for-bit, proven by q47), then floor/ceil re-enter integer
    * domain so every downstream sum is exact long arithmetic.
    *
    * Scale shape: exact percentile shuffles each type's values once
    * (the documented exact tier; q47b's sketch is the 100 TB path);
    * the clamp+mean pass is map-side partial over the same shuffle. */
  def winsorizedStats(events: DataFrame): DataFrame = {
    val cents = floor(col("value") * 100).cast("long")
    val bounds = events
      .select(col("event_type"), cents.as("c"))
      .groupBy(col("event_type"))
      .agg(floor(expr("percentile(c, 0.05)")).cast("long").as("lo_cents"),
        ceil(expr("percentile(c, 0.95)")).cast("long").as("hi_cents"))
    events
      .select(col("event_type"), cents.as("c"))
      .join(broadcast(bounds), Seq("event_type"))
      .select(col("event_type"), col("lo_cents"), col("hi_cents"),
        greatest(col("lo_cents"), least(col("hi_cents"), col("c"))).as("wc"),
        col("c"))
      .groupBy(col("event_type"))
      .agg(max(col("lo_cents")).as("lo_cents"), max(col("hi_cents")).as("hi_cents"),
        count(lit(1)).as("n"), sum(col("c")).as("raw_sum_cents"),
        sum(col("wc")).as("wins_sum_cents"))
      .orderBy(col("event_type"))
  }

  val declared: Seq[Declared] = Seq(
    Declared(
      "q150_event_paths",
      (s, dir) => eventPaths(Tables.load(s, dir, "events")),
      Some("""WITH t AS (
        |  SELECT user_id, event_type AS e1,
        |    lead(event_type, 1) OVER w AS e2,
        |    lead(event_type, 2) OVER w AS e3
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT e1, e2, e3, count(*) AS n, count(DISTINCT user_id) AS n_users
        |FROM t WHERE e3 IS NOT NULL
        |GROUP BY 1, 2, 3 ORDER BY n DESC, e1, e2, e3 LIMIT 10""".stripMargin),
      doc = "Top-10 per-user event-type trigram paths (two lead()s, path-vocab-bounded top-k)"),

    Declared(
      "q149_winsorized",
      (s, dir) => winsorizedStats(Tables.load(s, dir, "events")),
      Some("""WITH c AS (
        |  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS c FROM events),
        |b AS (
        |  SELECT event_type,
        |    CAST(floor(quantile_cont(CAST(c AS DOUBLE), 0.05)) AS BIGINT) AS lo_cents,
        |    CAST(ceil(quantile_cont(CAST(c AS DOUBLE), 0.95)) AS BIGINT) AS hi_cents
        |  FROM c GROUP BY 1)
        |SELECT c.event_type, max(b.lo_cents) AS lo_cents, max(b.hi_cents) AS hi_cents,
        |  count(*) AS n, CAST(sum(c.c) AS BIGINT) AS raw_sum_cents,
        |  CAST(sum(greatest(b.lo_cents, least(b.hi_cents, c.c))) AS BIGINT)
        |    AS wins_sum_cents
        |FROM c JOIN b USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "Winsorized per-type stats: clamp at [floor(p05), ceil(p95)], exact integer sums"),

    Declared(
      "q118_ab_test",
      (s, dir) => abTest(Tables.load(s, dir, "events")),
      Some("""WITH f AS (SELECT user_id, k AS k0, ts AS t0 FROM (
        |        SELECT user_id, ts,
        |          CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |          row_number() OVER (PARTITION BY user_id
        |            ORDER BY ts, event_id) AS rn
        |        FROM events) WHERE rn = 1),
        |a AS (SELECT e.user_id,
        |        CASE WHEN f.k0 % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
        |        max(e.event_type = 'purchase'
        |            AND e.ts <= f.t0 + INTERVAL 24 HOUR) AS converted
        |      FROM events e JOIN f ON e.user_id = f.user_id
        |      GROUP BY e.user_id, variant),
        |s AS (SELECT
        |        count(*) FILTER (variant = 'A') AS na,
        |        count(*) FILTER (variant = 'A' AND converted) AS ca,
        |        count(*) FILTER (variant = 'B') AS nb,
        |        count(*) FILTER (variant = 'B' AND converted) AS cb
        |      FROM a)
        |SELECT na, ca, round(CAST(ca AS DOUBLE) / na, 6) AS rate_a,
        |  nb, cb, round(CAST(cb AS DOUBLE) / nb, 6) AS rate_b,
        |  CASE WHEN sqrt((CAST(ca + cb AS DOUBLE) / (na + nb))
        |      * (1.0 - CAST(ca + cb AS DOUBLE) / (na + nb))
        |      * (1.0 / na + 1.0 / nb)) > 0
        |  THEN round((CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb)
        |    / sqrt((CAST(ca + cb AS DOUBLE) / (na + nb))
        |      * (1.0 - CAST(ca + cb AS DOUBLE) / (na + nb))
        |      * (1.0 / na + 1.0 / nb)), 6)
        |  END AS z
        |FROM s""".stripMargin),
      doc = "A/B readout: first-touch assignment, conversion, two-proportion z"),

    Declared(
      "q110_incremental_daily",
      (s, dir) => incrementalDaily(s, dir),
      Some("""SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n,
        |  round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100, 2)
        |    AS value_sum
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin),
      doc = "Incremental view maintenance: history snapshot + fresh-slice union"),

    Declared(
      "q111_rolling_hll",
      (s, dir) => rollingDistinctUsers(Tables.load(s, dir, "events")),
      None,
      doc = "7-day rolling distinct users via mergeable HLL sketch union (rows-only)"),

    Declared(
      "q188_hll_portable",
      (s, dir) => rollingDistinctPortable(Tables.load(s, dir, "events")),
      Some(hllPortableOracle),
      doc = "7-day rolling distinct users via a portable-hash HLL built from first principles - registers, sketch union (register max) and the raw estimate all replayed in the oracle; q111's library-sketch form stays the throughput path"),

    Declared(
      "q79_daily_active",
      (s, dir) => dailyActive(Tables.load(s, dir, "events")),
      Some("""WITH d AS (SELECT CAST(ts AS DATE) AS day,
        |         count(DISTINCT user_id) AS dau, count(*) AS n_events
        |       FROM events GROUP BY 1)
        |SELECT day, dau, n_events,
        |  CAST(sum(n_events) OVER (ORDER BY day
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS events_7d,
        |  round(avg(n_events) OVER (ORDER BY day
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS avg_7d
        |FROM d ORDER BY day""".stripMargin),
      doc = "DAU + trailing-7-day rolling event volume per day"),

    Declared(
      "q80_event_throttle",
      (s, dir) => throttleDedup(Tables.load(s, dir, "events")),
      Some("""WITH l AS (SELECT event_id, user_id, event_type, ts,
        |         lag(epoch_us(ts)) OVER (
        |           PARTITION BY user_id, event_type
        |           ORDER BY ts, event_id) AS prev_us
        |       FROM events)
        |SELECT event_id, user_id, event_type, ts FROM l
        |WHERE prev_us IS NULL OR epoch_us(ts) - prev_us > 300000000
        |ORDER BY event_id""".stripMargin),
      doc = "Debounce dedup: drop same-(user,type) repeats within 5 min"),

    Declared(
      "q81_funnel",
      (s, dir) => funnel(Tables.load(s, dir, "events")),
      Some("""WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
        |        WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS t_click
        |      FROM events e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS t_purchase
        |      FROM events e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY 1)
        |SELECT * FROM (
        |  SELECT 1 AS stage, 'view' AS step,
        |         (SELECT count(*) FROM v) AS n_users, 1.0 AS conversion
        |  UNION ALL
        |  SELECT 2, 'click_after_view', (SELECT count(*) FROM c),
        |         round(CAST((SELECT count(*) FROM c) AS DOUBLE)
        |           / (SELECT count(*) FROM v), 4)
        |  UNION ALL
        |  SELECT 3, 'purchase_after_click', (SELECT count(*) FROM p),
        |         round(CAST((SELECT count(*) FROM p) AS DOUBLE)
        |           / (SELECT count(*) FROM c), 4))
        |ORDER BY stage""".stripMargin),
      doc = "Strict-order view→click→purchase funnel with conversion rates"),

    Declared(
      "q84_transitions",
      (s, dir) => transitions(Tables.load(s, dir, "events")),
      Some("""WITH b AS (SELECT event_type AS from_type,
        |         lead(event_type) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS to_type
        |       FROM events),
        |c AS (SELECT from_type, to_type, count(*) AS n FROM b
        |      WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type), 4) AS p
        |FROM c ORDER BY from_type, to_type""".stripMargin),
      doc = "Per-user event-type transition matrix with row probabilities"),

    Declared(
      "q90_volume_anomaly",
      (s, dir) => volumeAnomaly(Tables.load(s, dir, "events")),
      Some("""WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |         count(*) AS n FROM events GROUP BY 1, 2),
        |st AS (SELECT event_type, count(*) AS days, sum(n) AS s,
        |         sum(n * n) AS ss FROM d GROUP BY 1 HAVING count(*) > 1)
        |SELECT event_type, day, n,
        |  round((CAST(n AS DOUBLE) - CAST(s AS DOUBLE) / days)
        |    / sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / days)
        |           / (days - 1)), 4) AS z,
        |  abs(round((CAST(n AS DOUBLE) - CAST(s AS DOUBLE) / days)
        |    / sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / days)
        |           / (days - 1)), 4)) >= 2.0 AS is_anomaly
        |FROM d JOIN st USING (event_type)
        |WHERE sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / days)
        |           / (days - 1)) > 0
        |ORDER BY event_type, day""".stripMargin),
      doc = "Daily-volume z-score anomaly flags from exact integer moments"),

    Declared(
      "q82_retention",
      (s, dir) => retention(Tables.load(s, dir, "events")),
      Some("""WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
        |        FROM events GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
        |SELECT f.cohort_day,
        |  CAST(datediff('day', f.cohort_day, a.day) AS INTEGER) AS day_offset,
        |  count(DISTINCT a.user_id) AS n_users
        |FROM a JOIN f ON a.user_id = f.user_id
        |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin),
      doc = "Day-0 cohort retention triangle (first-activity cohorts)"),

    Declared(
      "q196_theta_sketch",
      (s, dir) => thetaOverlap(Tables.load(s, dir, "events")),
      Some(thetaOracle(128)),
      doc = "Portable bottom-k (KMV/theta) sketches of per-event-type distinct users with PAIRWISE INTERSECTION estimates - the sketch set-operation HLL cannot do; build (WindowGroupLimit bottom-k), thetas and both estimators replayed exactly in the oracle"),

    Declared(
      "q197_quantile_sketch",
      (s, dir) => quantileSketch(Tables.load(s, dir, "events")),
      Some(quantileOracle(256)),
      doc = "Portable mergeable quantile sketch: deterministic md5 bottom-k uniform row sample + integer nearest-rank selection (no FP in the estimator) - the portable analog of percentile_approx's GK sketch, fully replayed in the oracle")
  )
}
