package graft.relational

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EventAnalyticsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("throttleDedup: drops repeats inside the gap, keeps the rest") {
    import spark.implicits._
    val events = Seq(
      // user 1, clicks 0s / +60s / +400s: the +60s one is debounced
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", 0.0),
      (2L, ts("2024-01-01 10:01:00"), 1L, "click", 0.0),
      (3L, ts("2024-01-01 10:06:40"), 1L, "click", 0.0),
      // different type inside the gap: untouched
      (4L, ts("2024-01-01 10:00:30"), 1L, "view", 0.0),
      // different user inside the gap: untouched
      (5L, ts("2024-01-01 10:00:30"), 2L, "click", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val kept = EventAnalytics.throttleDedup(events).collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(1L, 3L, 4L, 5L))
  }

  test("funnel: strict ordering excludes out-of-order journeys") {
    import spark.implicits._
    val events = Seq(
      // user 1: view → click → purchase (full funnel)
      (1L, ts("2024-01-01 09:00:00"), 1L, "view", 0.0),
      (2L, ts("2024-01-01 09:05:00"), 1L, "click", 0.0),
      (3L, ts("2024-01-01 09:10:00"), 1L, "purchase", 9.0),
      // user 2: click BEFORE view, purchase after view but no ordered click
      (4L, ts("2024-01-01 08:00:00"), 2L, "click", 0.0),
      (5L, ts("2024-01-01 08:30:00"), 2L, "view", 0.0),
      (6L, ts("2024-01-01 09:00:00"), 2L, "purchase", 5.0),
      // user 3: view only
      (7L, ts("2024-01-01 07:00:00"), 3L, "view", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = EventAnalytics.funnel(events).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == Seq(
      (1, "view", 3L, 1.0),
      (2, "click_after_view", 1L, 0.3333),
      (3, "purchase_after_click", 1L, 1.0)))
  }

  test("retention: offsets count distinct users against first-activity day") {
    import spark.implicits._
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0),  // u1 day0 = Jan 1
      (2L, ts("2024-01-02 10:00:00"), 1L, "view", 0.0),  // u1 back on day+1
      (3L, ts("2024-01-02 11:00:00"), 1L, "click", 0.0), // same day, counted once
      (4L, ts("2024-01-01 12:00:00"), 2L, "view", 0.0),  // u2 day0 = Jan 1
      (5L, ts("2024-01-03 12:00:00"), 2L, "view", 0.0),  // u2 back on day+2
      (6L, ts("2024-01-02 09:00:00"), 3L, "view", 0.0)   // u3 day0 = Jan 2
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = EventAnalytics.retention(events).collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("2024-01-01", 0, 2L), ("2024-01-01", 1, 1L), ("2024-01-01", 2, 1L),
      ("2024-01-02", 0, 1L)))
  }

  test("transitions: per-user bigrams with row-normalized probabilities") {
    import spark.implicits._
    val events = Seq(
      // user 1: view → click → view
      (1L, ts("2024-01-01 09:00:00"), 1L, "view", 0.0),
      (2L, ts("2024-01-01 09:05:00"), 1L, "click", 0.0),
      (3L, ts("2024-01-01 09:10:00"), 1L, "view", 0.0),
      // user 2: view → view
      (4L, ts("2024-01-01 08:00:00"), 2L, "view", 0.0),
      (5L, ts("2024-01-01 08:30:00"), 2L, "view", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = EventAnalytics.transitions(events).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == Seq(
      ("click", "view", 1L, 1.0),
      ("view", "click", 1L, 0.5),
      ("view", "view", 1L, 0.5)))
  }

  test("volumeAnomaly: flags the spike day, drops constant-volume types") {
    import spark.implicits._
    // type "a": 5 days × 10 events + one 100-event spike day (z ≈ 2.04);
    // type "b": constant volume → sd = 0 → excluded entirely.
    val rows = (1 to 6).flatMap { d =>
      val n = if (d == 6) 100 else 10
      (1 to n).map(i =>
        (d * 1000L + i, ts(f"2024-01-0$d 10:00:00"), i.toLong, "a", 0.0))
    } ++ (1 to 2).flatMap { d =>
      (1 to 5).map(i =>
        (90000L + d * 100 + i, ts(f"2024-01-0$d 11:00:00"), i.toLong, "b", 0.0))
    }
    val events = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = EventAnalytics.volumeAnomaly(events).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
        r.getDouble(3), r.getBoolean(4))).toSeq
    assert(got.forall(_._1 == "a"), s"constant type must drop: $got")
    assert(got.size == 6)
    val flagged = got.filter(_._5)
    assert(flagged.map(_._2) == Seq("2024-01-06"))
    assert(flagged.head._4 > 2.0 && flagged.head._4 < 2.1)
    assert(got.filter(!_._5).forall(r => math.abs(r._4) < 1.0))
  }

  test("stratifiedFixed: exact allocation, deterministic, capped by stratum size") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val got = graft.text.SampleOps.stratifiedFixed(docs).collect()
    val perLang = got.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    val sizes = docs.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (lang, n) =>
      assert(perLang.getOrElse(lang, 0) == math.min(20L, n).toInt, s"lang $lang")
    }
    val again = graft.text.SampleOps.stratifiedFixed(docs).collect()
    assert(got.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("abTest: first-touch assignment, attribution window, degenerate z") {
    import spark.implicits._
    def ev(id: Long, t: String, u: Long, typ: String, k: Int) =
      (id, ts(t), u, typ, 0.5, s"""{"k": $k}""")
    // user 1 → k=2 even → A, purchase 1h after first touch → converted
    // user 2 → k=4 even → A, purchase 48h later → NOT converted
    // user 3 → k=3 odd  → B, no purchase
    // user 4 → k=7 odd  → B, purchase inside the window → converted
    val events = Seq(
      ev(1, "2024-01-01 10:00:00", 1, "view", 2),
      ev(2, "2024-01-01 11:00:00", 1, "purchase", 9),
      ev(3, "2024-01-02 10:00:00", 2, "view", 4),
      ev(4, "2024-01-04 11:00:00", 2, "purchase", 9),
      ev(5, "2024-01-03 10:00:00", 3, "view", 3),
      ev(6, "2024-01-05 10:00:00", 4, "view", 7),
      ev(7, "2024-01-05 12:00:00", 4, "purchase", 9))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventAnalytics.abTest(events).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 1L)   // na, ca
    assert(r.getLong(3) == 2L && r.getLong(4) == 1L)   // nb, cb
    assert(r.getDouble(2) == 0.5 && r.getDouble(5) == 0.5)
    assert(math.abs(r.getDouble(6)) < 1e-9)            // equal rates → z = 0
    // degenerate: every user converts → pooled variance 0 → z is NULL
    val allConv = Seq(
      ev(1, "2024-01-01 10:00:00", 1, "purchase", 2),
      ev(2, "2024-01-01 10:00:00", 2, "purchase", 3))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(EventAnalytics.abTest(allConv).collect().head.isNullAt(6))
  }

  test("rollingDistinctUsers: HLL 7-day estimate within 5% of exact") {
    import org.apache.spark.sql.functions._
    val events = graft.Tables.load(spark, sf0001, "events")
    val got = EventAnalytics.rollingDistinctUsers(events).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSeq
    assert(got.nonEmpty)
    // exact 7-day rolling distinct via day × trailing-window self-join
    val daily = events.select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val days = daily.select(col("day")).distinct()
    val exact = days.as("d")
      .join(daily.as("u"),
        col("u.day") >= date_sub(col("d.day"), 6) && col("u.day") <= col("d.day"))
      .groupBy(col("d.day")).agg(count_distinct(col("u.user_id")).as("n"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    got.foreach { case (day, dau, est) =>
      val ex = exact(day)
      assert(est >= dau, s"$day: union estimate $est below exact DAU $dau")
      assert(math.abs(est - ex).toDouble / ex <= 0.05,
        s"$day: est $est vs exact $ex")
    }
    // deterministic rerun (HLL registers are order-independent maxima)
    val again = EventAnalytics.rollingDistinctUsers(events.repartition(13)).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSeq
    assert(got == again)
  }

  test("rollingDistinctPortable: raw m=64 estimate tracks exact within 3 sigma, repartition-stable") {
    import org.apache.spark.sql.functions._
    val events = graft.Tables.load(spark, sf0001, "events")
    val got = EventAnalytics.rollingDistinctPortable(events).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSeq
    assert(got.nonEmpty)
    val daily = events.select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val days = daily.select(col("day")).distinct()
    val exact = days.as("d")
      .join(daily.as("u"),
        col("u.day") >= date_sub(col("d.day"), 6) && col("u.day") <= col("d.day"))
      .groupBy(col("d.day")).agg(count_distinct(col("u.user_id")).as("n"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    // raw HLL at m = 64: relative error sigma ~ 1.04/sqrt(64) = 13%
    got.foreach { case (day, _, est) =>
      val ex = exact(day)
      assert(math.abs(est - ex).toDouble / ex <= 0.39,
        s"$day: portable est $est vs exact $ex")
    }
    val again = EventAnalytics.rollingDistinctPortable(events.repartition(13))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSeq
    assert(got == again)
  }

  test("eventPaths: consecutive triples per user, counted across users") {
    import spark.implicits._
    val events = Seq(
      // user 1: v c p  → one triple (v,c,p)
      (1L, ts("2024-01-01 09:00:00"), 1L, "v", 0.0),
      (2L, ts("2024-01-01 09:01:00"), 1L, "c", 0.0),
      (3L, ts("2024-01-01 09:02:00"), 1L, "p", 0.0),
      // user 2: v c p x → triples (v,c,p) and (c,p,x)
      (4L, ts("2024-01-01 10:00:00"), 2L, "v", 0.0),
      (5L, ts("2024-01-01 10:01:00"), 2L, "c", 0.0),
      (6L, ts("2024-01-01 10:02:00"), 2L, "p", 0.0),
      (7L, ts("2024-01-01 10:03:00"), 2L, "x", 0.0),
      // user 3: only two events → no triple
      (8L, ts("2024-01-01 11:00:00"), 3L, "v", 0.0),
      (9L, ts("2024-01-01 11:01:00"), 3L, "c", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventAnalytics.eventPaths(events).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(("v", "c", "p", 2L, 2L), ("c", "p", "x", 1L, 1L)))
  }

  test("eventPaths: triples never cross users") {
    import spark.implicits._
    val events = Seq(
      (1L, ts("2024-01-01 09:00:00"), 1L, "a", 0.0),
      (2L, ts("2024-01-01 09:01:00"), 1L, "b", 0.0),
      (3L, ts("2024-01-01 09:02:00"), 2L, "c", 0.0),
      (4L, ts("2024-01-01 09:03:00"), 2L, "d", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(EventAnalytics.eventPaths(events).collect().isEmpty)
  }

  test("winsorizedStats: clamp changes only the tails") {
    import spark.implicits._
    // 21 values 0,100,...,2000 cents: p05 = 100 (index 1 of 0..20),
    // p95 = 1900 → clamp 0→100 and 2000→1900
    val events = (0 to 20).map(i =>
      (i.toLong, ts("2024-01-01 09:00:00"), 1L, "t", i * 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = EventAnalytics.winsorizedStats(events).collect().head
    assert((r.getLong(1), r.getLong(2)) == ((100L, 1900L)))
    assert(r.getLong(3) == 21L)
    assert(r.getLong(4) == (0 to 20).map(_ * 100L).sum)
    assert(r.getLong(5) == r.getLong(4) + 100L - 100L) // +100 at lo, -100 at hi
  }

  test("theta sketch: estimates track exact distincts and intersections") {
    import spark.implicits._
    // 3 types with known user sets: A = 0..999, B = 500..1499 (|∩|=500),
    // C = 0..49 (< k ⇒ exact mode).
    val rows =
      (0 until 1000).map(u => (u.toLong, ts("2024-01-01 10:00:00"), u.toLong, "A", 0.0)) ++
      (500 until 1500).map(u => (10000L + u, ts("2024-01-01 10:00:00"), u.toLong, "B", 0.0)) ++
      (0 until 50).map(u => (20000L + u, ts("2024-01-01 10:00:00"), u.toLong, "C", 0.0))
    val events = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventAnalytics.thetaOverlap(events, k = 128).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toList
    val ab = out.find(t => t._1 == "A" && t._2 == "B").get
    // KMV with k=128 over 1000 distinct: relative error ~1/sqrt(k-2) ≈ 9%
    assert(math.abs(ab._3 - 1000) < 300, s"est_A=${ab._3}")
    assert(math.abs(ab._4 - 1000) < 300, s"est_B=${ab._4}")
    assert(math.abs(ab._6 - 500) < 250, s"est_A∩B=${ab._6}")
    val ac = out.find(t => t._1 == "A" && t._2 == "C").get
    assert(ac._4 == 50L, "C below k must be EXACT")
    // determinism under repartitioning (order-independent sketch)
    val again = EventAnalytics.thetaOverlap(events.repartition(7), k = 128)
      .collect().map(_.toString).toList
    assert(again == out.map(t => s"[${t._1},${t._2},${t._3},${t._4},${t._5},${t._6}]"))
  }

  test("quantile sketch: exact below k, deterministic under repartition") {
    import spark.implicits._
    // 100 rows (< k=256) ⇒ the sample IS the set: nearest-rank quantiles
    // are the exact order statistics ⌈p·100⌉ of 1..100.
    val events = (1 to 100).map(i =>
        (i.toLong, ts("2024-01-01 10:00:00"), i.toLong, "A", i.toDouble))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = EventAnalytics.quantileSketch(events).collect().head
    assert(r.getLong(1) == 100L)
    assert((r.getDouble(2), r.getDouble(3), r.getDouble(4)) == ((50.0, 90.0, 99.0)))
    val big = (1 to 5000).map(i =>
        (i.toLong, ts("2024-01-01 10:00:00"), i.toLong, "A", i.toDouble))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val a = EventAnalytics.quantileSketch(big).collect().head
    val b = EventAnalytics.quantileSketch(big.repartition(13)).collect().head
    assert(a.toString == b.toString, "sample must be partitioning-independent")
    // uniform 1..5000: sampled p90 within a few percent of 4500
    assert(math.abs(a.getDouble(3) - 4500.0) < 500, s"p90=${a.getDouble(3)}")
  }
}
