package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Declared, Tables}

/** Change-data-capture shapes — the warehouse maintenance operators a
  * pipeline runs between ingestion and analytics:
  *
  *  - upsert compaction: a key's LATEST version wins across a base
  *    snapshot and a change batch, tombstones delete — the MERGE
  *    semantics, composed as ONE hash aggregation (`max(struct(...))`
  *    with map-side partials), never a window sort over the log;
  *  - SCD2 intervals: a keyed event log collapses into validity
  *    ranges [valid_from, valid_to) per run of equal attribute value —
  *    the slowly-changing-dimension history build.
  */
object ChangeData {

  /** Last-write-wins per user across base ∪ changes; a change row with
    * `value < 0.1` is a tombstone that deletes the key. Version order
    * is (ts, event_id) — unique, so the struct max is total and the
    * survivor deterministic. One shuffle on the key; the struct max
    * pre-merges map-side (no per-key log sort anywhere). */
  def upsertCompact(base: DataFrame, changes: DataFrame): DataFrame = {
    val tagged = base.withColumn("is_delete", lit(false))
      .unionByName(changes.withColumn("is_delete", col("value") < 0.1))
    tagged
      .groupBy(col("user_id"))
      .agg(max(struct(col("ts"), col("event_id"), col("is_delete"),
        col("event_type"), col("value"))).as("w"))
      .filter(!col("w.is_delete"))
      .select(col("user_id"), col("w.event_id").as("event_id"),
        col("w.ts").as("ts"), col("w.event_type").as("event_type"),
        round(col("w.value"), 6).as("value"))
      .orderBy(col("user_id"))
  }

  /** SCD2 history: per user, consecutive events with the SAME
    * event_type collapse into one validity interval; a change opens a
    * new interval whose `valid_from` is the change's timestamp and
    * closes the previous one (`valid_to` = next change, NULL while
    * current). Change detection is one lag window, run-grouping one
    * running count — both over the per-user partition, one shuffle. */
  def scd2Intervals(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val runs = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("changed",
        when(lag(col("event_type"), 1).over(byUser).isNull
          || lag(col("event_type"), 1).over(byUser) =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("run_id", sum(col("changed")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
    runs
      .groupBy(col("user_id"), col("run_id"), col("event_type"))
      .agg(min(col("ts")).as("valid_from"), count(lit(1)).as("n_events"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(
        Window.partitionBy(col("user_id")).orderBy(col("run_id"))))
      .select(col("user_id"), col("run_id"), col("event_type"),
        col("valid_from"), col("valid_to"), col("n_events"))
      .orderBy(col("user_id"), col("run_id"))
  }

  /** Snapshot diff: classify every primary key across two table
    * versions as added / removed / changed (unchanged rows drop).
    * ONE co-partitioned full-outer hash join on the key — both sides
    * shuffle once; with both snapshots bucketed/partitioned by pk at
    * the warehouse layer even that shuffle disappears. Output size is
    * the churn, not the table. Money compares in exact integer cents. */
  def snapshotDiff(v1: DataFrame, v2: DataFrame): DataFrame = {
    val a = v1.select(col("pk"), col("cents").as("old_cents"),
      col("attr").as("old_attr"))
    val b = v2.select(col("pk"), col("cents").as("new_cents"),
      col("attr").as("new_attr"))
    a.join(b, Seq("pk"), "full_outer")
      .withColumn("status",
        when(col("old_cents").isNull, lit("added"))
          .when(col("new_cents").isNull, lit("removed"))
          .when(col("old_cents") =!= col("new_cents")
            || col("old_attr") =!= col("new_attr"), lit("changed"))
          .otherwise(lit("unchanged")))
      .filter(col("status") =!= "unchanged")
      .select(col("pk"), col("status"), col("old_cents"), col("new_cents"))
      .orderBy(col("pk"))
  }

  /** Derive two deterministic order-table "versions" for q133: v2
    * inserts the keys ≡0 mod 97 (absent from v1), deletes the keys
    * ≡0 mod 89, and bumps the price of keys ≡0 mod 7 by 5 dollars. */
  private def orderVersions(orders: DataFrame): (DataFrame, DataFrame) = {
    val base = orders.select(col("o_orderkey").as("pk"),
      floor(col("o_totalprice") * 100).cast("long").as("cents"),
      col("o_orderpriority").as("attr"))
    val v1 = base.filter(pmod(col("pk"), lit(97L)) =!= 0L)
    val v2 = base.filter(pmod(col("pk"), lit(89L)) =!= 0L)
      .withColumn("cents",
        when(pmod(col("pk"), lit(7L)) === 0L, col("cents") + 500L)
          .otherwise(col("cents")))
    (v1, v2)
  }

  val declared: Seq[Declared] = Seq(
    Declared(
      "q133_snapshot_diff",
      (s, dir) => {
        val (v1, v2) = orderVersions(Tables.load(s, dir, "orders"))
        snapshotDiff(v1, v2)
      },
      Some("""WITH base AS (
        |  SELECT o_orderkey AS pk,
        |         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
        |         o_orderpriority AS attr
        |  FROM orders),
        |v1 AS (SELECT * FROM base WHERE pk % 97 <> 0),
        |v2 AS (SELECT pk,
        |         CASE WHEN pk % 7 = 0 THEN cents + 500 ELSE cents END AS cents,
        |         attr
        |       FROM base WHERE pk % 89 <> 0),
        |j AS (SELECT coalesce(v1.pk, v2.pk) AS pk,
        |        v1.cents AS old_cents, v2.cents AS new_cents,
        |        v1.attr AS old_attr, v2.attr AS new_attr
        |      FROM v1 FULL OUTER JOIN v2 ON v1.pk = v2.pk)
        |SELECT pk,
        |  CASE WHEN old_cents IS NULL THEN 'added'
        |       WHEN new_cents IS NULL THEN 'removed'
        |       WHEN old_cents <> new_cents OR old_attr <> new_attr
        |         THEN 'changed'
        |       ELSE 'unchanged' END AS status,
        |  old_cents, new_cents
        |FROM j
        |WHERE NOT (old_cents IS NOT NULL AND new_cents IS NOT NULL
        |           AND old_cents = new_cents AND old_attr = new_attr)
        |ORDER BY pk""".stripMargin),
      doc = "Snapshot diff: added/removed/changed keys across two table versions"),

    Declared(
      // base = hash-stable 2/3 slice, changes = the remaining 1/3:
      // a deterministic stand-in for snapshot + CDC batch
      "q112_upsert_compact",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        upsertCompact(ev.filter(pmod(col("event_id"), lit(3L)) =!= 0L),
          ev.filter(pmod(col("event_id"), lit(3L)) === 0L))
      },
      Some("""WITH tagged AS (
        |  SELECT user_id, ts, event_id, event_type, value,
        |         (event_id % 3 = 0 AND value < 0.1) AS is_delete
        |  FROM events),
        |r AS (SELECT *, row_number() OVER (
        |        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM tagged)
        |SELECT user_id, event_id, ts, event_type, round(value, 6) AS value
        |FROM r WHERE rn = 1 AND NOT is_delete
        |ORDER BY user_id""".stripMargin),
      doc = "CDC upsert compaction: latest version wins, tombstones delete (MERGE shape)"),

    Declared(
      "q113_scd2",
      (s, dir) => scd2Intervals(Tables.load(s, dir, "events")),
      Some("""WITH l AS (SELECT user_id, ts, event_id, event_type,
        |         CASE WHEN lag(event_type) OVER w IS NULL
        |                OR lag(event_type) OVER w <> event_type
        |              THEN 1 ELSE 0 END AS changed
        |       FROM events
        |       WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |runs AS (SELECT *, CAST(sum(changed) OVER (
        |           PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_id
        |         FROM l),
        |g AS (SELECT user_id, run_id, event_type,
        |        min(ts) AS valid_from, count(*) AS n_events
        |      FROM runs GROUP BY 1, 2, 3)
        |SELECT user_id, run_id, event_type, valid_from,
        |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY run_id)
        |    AS valid_to, n_events
        |FROM g ORDER BY user_id, run_id""".stripMargin),
      doc = "SCD2 validity intervals per keyed attribute run (history build)")
  )
}
