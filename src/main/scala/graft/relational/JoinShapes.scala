package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{Declared, Tables}

/** The TPC-H Q21 join shape — EXISTS + NOT-EXISTS against the same
  * fact table — the hardest of the classic subquery decorrelations and
  * the canonical stress test for semi/anti join planning.
  *
  * "Suppliers who kept orders waiting": a supplier's line shipped late
  * (> 90 days after the order date) in a multi-supplier order where
  * every OTHER supplier shipped on time. Composed Spark-first as one
  * fact⋈orders join plus ONE `groupBy(l_orderkey)` aggregation that
  * answers both the EXISTS (≥2 distinct suppliers) and the NOT EXISTS
  * (exactly 1 distinct late supplier) per order — the fact table is
  * scanned and shuffled once; the supplier name join broadcasts.
  *
  * The driver's DuckDB mirror states it in the textbook EXISTS /
  * NOT EXISTS form, proving the decorrelated join cascade computes the
  * subquery semantics exactly. */
object JoinShapes {

  def waitingSuppliers(lineitem: DataFrame, orders: DataFrame,
      supplier: DataFrame, lateDays: Int = 90, topN: Int = 20): DataFrame = {
    val li = lineitem.select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    // One fact ⋈ orders join tags every line late/on-time; ONE
    // groupBy(l_orderkey) pass then answers both subqueries per order:
    //   EXISTS other supplier        ⇔ |distinct suppliers| ≥ 2
    //   NOT EXISTS other late suppl. ⇔ |distinct late suppliers| = 1
    // and carries who that sole late supplier is plus how many of their
    // lines were late — so no join back to the fact table at all. The
    // round-4 plan probed full lineitem twice more (semi + anti) on the
    // same key; this is the aggregation those probes were simulating.
    // collect_set (orders have a handful of suppliers) instead of two
    // count(DISTINCT)s, which would plan an Expand that doubles the
    // shuffled fact rows.
    // FK-integrity assumption (ADVICE r5): n_supp counts suppliers on
    // lines SURVIVING the inner join to orders, while the classic
    // EXISTS scans raw lineitem — equivalent iff every l_orderkey has
    // an orders row (holds for TPC-H-generated data). A dangling
    // orderkey's lines would be invisible here.
    val isLate = col("l_shipdate") > col("o_orderdate") + expr(s"interval $lateDays days")
    val perOrder = li
      .join(orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"), isLate.as("late"))
      .groupBy(col("l_orderkey"))
      .agg(
        size(collect_set(col("l_suppkey"))).as("n_supp"),
        size(collect_set(when(col("late"), col("l_suppkey")))).as("n_late_supp"),
        min(when(col("late"), col("l_suppkey"))).as("late_supp"),
        count(when(col("late"), lit(1))).as("n_late_lines"))
    perOrder
      .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
      .groupBy(col("late_supp").as("l_suppkey"))
      .agg(sum(col("n_late_lines")).as("numwait"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"))),
        col("s_suppkey") === col("l_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey"))
      .limit(topN)
  }

  /** TPC-H Q22 shape — scalar aggregate subquery + NOT EXISTS:
    * "well-funded customers who never ordered", per nation. The
    * threshold (average positive balance) is a one-row aggregate that
    * broadcasts into the filter — a scalar subquery costs one tiny job,
    * never a shuffle of the fact side; the NOT EXISTS decorrelates to a
    * left-anti join co-partitioned on the customer key.
    *
    * Balances quantize to integer cents BEFORE any sum (q68's idiom) so
    * threshold and totals are exact integer math in both engines. */
  def untappedCustomers(customer: DataFrame, orders: DataFrame): DataFrame = {
    val cust = customer.select(col("c_custkey"), col("c_nationkey"),
      round(col("c_acctbal") * 100).cast("long").as("bal_cents"))
    val thresh = cust.filter(col("bal_cents") > 0)
      .agg((sum(col("bal_cents")).cast("double") / count(lit(1))).as("avg_cents"))
    cust
      .join(broadcast(thresh), col("bal_cents").cast("double") > col("avg_cents"))
      .join(orders.select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"),
        round(sum(col("bal_cents")).cast("double") / 100, 2).as("totacctbal"))
      .orderBy(col("c_nationkey"))
  }

  /** TPC-H Q17 shape — a correlated per-group average ("lines whose
    * quantity is under 20% of that part's average") decorrelated into
    * one aggregate over the fact table joined back to the fact on the
    * SAME key: both sides of the join come off one `l_partkey` shuffle
    * lineage. The threshold test is pure integer math —
    * 5·qty·n < Σqty in centi-units — so no float average can flip a
    * boundary row between engines. Output per brand (broadcast dim). */
  def smallQuantityRevenue(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val li = lineitem.select(col("l_partkey"),
      round(col("l_quantity") * 100).cast("long").as("qc"),
      round(col("l_extendedprice") * 100).cast("long").as("pc"))
    val perPart = li.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_lines"), sum(col("qc")).as("sum_qc"))
    li.join(perPart, Seq("l_partkey"))
      .filter(col("qc") * 5 * col("n_lines") < col("sum_qc"))
      .join(broadcast(part.select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_small"),
        round(sum(col("pc")).cast("double") / 100, 2).as("revenue"))
      .orderBy(col("p_brand"))
  }

  /** TPC-H Q19 shape — disjunctive brand/size/quantity predicates
    * spanning both join sides. Catalyst factors the common
    * `l_partkey = p_partkey` conjunct out of the OR so the join stays
    * an equi-join (hash, broadcast dim), and pushes the single-sided
    * disjuncts (p_size ranges, l_quantity ranges) down to their scans —
    * the plan property that keeps this shape off a nested-loop join. */
  def brandRevenue(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val j = lineitem
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 15)
          && col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 25)
          && col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 35)
          && col("l_quantity").between(20, 30)))
    j.groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_lines"),
        round(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast("long")).cast("double") / 100, 2).as("revenue"))
      .orderBy(col("p_brand"))
  }

  /** Banded (bucketed) range join — q07's semantics at a scale where
    * NEITHER side broadcasts. A band predicate |c − s| ≤ band maps to
    * bucket arithmetic: points bucket once at width = band, probes
    * explode to their 3 adjacent buckets, and the non-equi predicate
    * becomes an EQUI-join on the bucket key (shuffle-partitionable on
    * both sides) plus an exact refine. Work is Σ per-bucket products —
    * bounded by value locality, not corpus size; the 3× probe fan-out
    * is the constant price of generality. All bucket math is integer
    * cents, so the refine and the aggregate are engine-exact. */
  def bandedRangeJoin(customer: DataFrame, supplier: DataFrame,
                      bandCents: Long = 10000L): DataFrame = {
    val c = customer.select(
      round(col("c_acctbal") * 100).cast("long").as("cc"))
      .withColumn("bucket", floor(col("cc").cast("double") / bandCents).cast("long"))
    val s = supplier.select(col("s_suppkey"),
      round(col("s_acctbal") * 100).cast("long").as("sc"))
      .withColumn("bucket", explode(sequence(
        floor((col("sc") - bandCents).cast("double") / bandCents).cast("long"),
        floor((col("sc") + bandCents).cast("double") / bandCents).cast("long"))))
    s.join(c, Seq("bucket"))
      .filter(col("cc") >= col("sc") - bandCents
        && col("cc") <= col("sc") + bandCents)
      .groupBy(col("s_suppkey"))
      .agg(count(lit(1)).as("n_close"),
        (sum(col("cc")).cast("double") / 100.0).as("sum_bal"))
      .orderBy(col("s_suppkey"))
  }

  /** Interval-OVERLAP join (interval × interval, vs q07/q109's point ×
    * interval): urgent-order activity windows [orderdate, +3d] against
    * low-priority windows in the SAME nation. The non-equi overlap
    * predicate (s₁ ≤ e₂ ∧ s₂ ≤ e₁) becomes an equi-join on
    * (nation, week-bucket): each interval explodes to every bucket it
    * touches (≤ 2 at width ≥ length), and a pair is emitted exactly
    * once — in the bucket of max(s₁, s₂), which any overlapping pair
    * provably shares (max(s) lies inside both intervals) — so no
    * distinct pass. Work is Σ per-(nation, week) products: bounded by
    * temporal locality, never \|L\|·\|R\|. Output aggregates per left
    * order (the churn-sized grain). Date math is whole integer days. */
  def intervalOverlapJoin(orders: DataFrame, customer: DataFrame,
                          lenDays: Int = 3, widthDays: Int = 7): DataFrame = {
    val epoch = lit("1970-01-01").cast("date")
    val o = orders
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("c_nationkey").as("nation"),
        datediff(to_date(col("o_orderdate")), epoch).as("s"))
      .withColumn("e", col("s") + lenDays)
    def banded(side: DataFrame) = side.withColumn("bucket",
      explode(sequence(floor(col("s").cast("double") / widthDays).cast("long"),
        floor(col("e").cast("double") / widthDays).cast("long"))))
    val l = banded(o.filter(col("o_orderpriority") === "1-URGENT"))
      .select(col("nation"), col("bucket"), col("o_orderkey").as("o1"),
        col("s").as("s1"), col("e").as("e1"))
    val r = banded(o.filter(col("o_orderpriority") === "5-LOW"))
      .select(col("nation"), col("bucket"), col("o_orderkey").as("o2"),
        col("s").as("s2"), col("e").as("e2"))
    l.join(r, Seq("nation", "bucket"))
      .filter(col("s1") <= col("e2") && col("s2") <= col("e1"))
      .filter(col("bucket") ===
        floor(greatest(col("s1"), col("s2")).cast("double") / widthDays)
          .cast("long"))
      .groupBy(col("o1"), col("nation"))
      .agg(count(lit(1)).as("n_overlaps"),
        sum(least(col("e1"), col("e2")) - greatest(col("s1"), col("s2")) + 1)
          .as("total_overlap_days"))
      .orderBy(col("o1"))
  }

  /** Relational division ("FOR ALL") — the classic shape missing from
    * the join family: event types active in EVERY hour-of-day the log
    * covers. Implemented by the count-match rewrite (countDistinct per
    * group == countDistinct of the divisor), not the textbook double
    * NOT EXISTS: the division collapses to two distinct aggregations —
    * the per-partition distinct partials bound the shuffle by
    * |types| × 24 rows at any event volume, where the nested-anti-join
    * form would shuffle the cross space. The divisor (one row) joins
    * back by broadcast; no driver action. */
  def hourlyDivision(events: DataFrame): DataFrame = {
    val hrs = events.select(col("event_type"), hour(col("ts")).as("h"))
    val divisor = hrs.agg(countDistinct(col("h")).as("n_all"))
    hrs.groupBy(col("event_type"))
      .agg(countDistinct(col("h")).as("n_hours"))
      .crossJoin(broadcast(divisor))
      .filter(col("n_hours") === col("n_all"))
      .select(col("event_type"), col("n_hours"))
      .orderBy(col("event_type"))
  }

  val declared: Seq[Declared] = Seq(
    Declared(
      "q161_division",
      (s, dir) => hourlyDivision(Tables.load(s, dir, "events")),
      Some("""WITH h AS (
        |  SELECT event_type, CAST(extract(hour FROM ts) AS INT) AS h
        |  FROM events),
        |tot AS (SELECT count(DISTINCT h) AS n_all FROM h)
        |SELECT event_type, count(DISTINCT h) AS n_hours
        |FROM h GROUP BY event_type
        |HAVING count(DISTINCT h) = (SELECT n_all FROM tot)
        |ORDER BY event_type""".stripMargin),
      doc = "Relational division (FOR ALL hours) via the count-match rewrite — two distinct aggs, no nested anti join"),

    Declared(
      "q135_interval_overlap",
      (s, dir) => intervalOverlapJoin(Tables.load(s, dir, "orders"),
        Tables.load(s, dir, "customer")),
      Some("""WITH o AS (
        |  SELECT o_orderkey, o_orderpriority, c_nationkey AS nation,
        |         CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS s,
        |         CAST(o_orderdate AS DATE) - DATE '1970-01-01' + 3 AS e
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |l AS (SELECT * FROM o WHERE o_orderpriority = '1-URGENT'),
        |r AS (SELECT * FROM o WHERE o_orderpriority = '5-LOW')
        |SELECT l.o_orderkey AS o1, l.nation,
        |  count(*) AS n_overlaps,
        |  CAST(sum(least(l.e, r.e) - greatest(l.s, r.s) + 1) AS BIGINT)
        |    AS total_overlap_days
        |FROM l JOIN r ON l.nation = r.nation
        |  AND l.s <= r.e AND r.s <= l.e
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin),
      doc = "Interval-overlap join via touched-bucket equi-join, emit-once rule"),

    Declared(
      "q109_banded_range_join",
      (s, dir) => bandedRangeJoin(Tables.load(s, dir, "customer"),
        Tables.load(s, dir, "supplier")),
      Some("""SELECT s_suppkey, count(*) AS n_close,
        |  CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0
        |    AS sum_bal
        |FROM supplier JOIN customer
        |  ON CAST(round(c_acctbal * 100) AS BIGINT)
        |       BETWEEN CAST(round(s_acctbal * 100) AS BIGINT) - 10000
        |           AND CAST(round(s_acctbal * 100) AS BIGINT) + 10000
        |GROUP BY s_suppkey ORDER BY s_suppkey""".stripMargin),
      doc = "Band join as bucket equi-join + refine (q07 semantics, no broadcast)"),

    Declared(
      "q106_small_quantity",
      (s, dir) => smallQuantityRevenue(Tables.load(s, dir, "lineitem"),
        Tables.load(s, dir, "part")),
      Some("""WITH li AS (SELECT l_partkey,
        |        CAST(round(l_quantity * 100) AS BIGINT) AS qc,
        |        CAST(round(l_extendedprice * 100) AS BIGINT) AS pc
        |      FROM lineitem),
        |pp AS (SELECT l_partkey, count(*) AS n_lines, sum(qc) AS sum_qc
        |       FROM li GROUP BY 1)
        |SELECT p_brand, count(*) AS n_small,
        |  round(CAST(sum(pc) AS DOUBLE) / 100, 2) AS revenue
        |FROM li JOIN pp USING (l_partkey) JOIN part ON l_partkey = p_partkey
        |WHERE qc * 5 * n_lines < sum_qc
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin),
      doc = "TPC-H Q17 shape: correlated per-part average as a self-join aggregate"),

    Declared(
      "q107_brand_revenue",
      (s, dir) => brandRevenue(Tables.load(s, dir, "lineitem"),
        Tables.load(s, dir, "part")),
      Some("""SELECT p_brand, count(*) AS n_lines,
        |  round(CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
        |    AS BIGINT)) AS DOUBLE) / 100, 2) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
        |       AND l_quantity BETWEEN 20 AND 30)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin),
      doc = "TPC-H Q19 shape: disjunctive cross-side predicates over an equi-join"),

    Declared(
      "q101_untapped_customers",
      (s, dir) => untappedCustomers(Tables.load(s, dir, "customer"),
        Tables.load(s, dir, "orders")),
      Some("""WITH c AS (SELECT c_custkey, c_nationkey,
        |        CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
        |      FROM customer),
        |t AS (SELECT CAST(sum(bal_cents) AS DOUBLE) / count(*) AS avg_cents
        |      FROM c WHERE bal_cents > 0)
        |SELECT c_nationkey, count(*) AS numcust,
        |  round(CAST(sum(bal_cents) AS DOUBLE) / 100, 2) AS totacctbal
        |FROM c, t
        |WHERE CAST(bal_cents AS DOUBLE) > avg_cents
        |  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin),
      doc = "TPC-H Q22 shape: scalar-subquery threshold + NOT EXISTS anti join"),

    Declared(
      "q97_waiting_suppliers",
      (s, dir) => waitingSuppliers(Tables.load(s, dir, "lineitem"),
        Tables.load(s, dir, "orders"), Tables.load(s, dir, "supplier")),
      Some("""WITH late AS (
        |  SELECT l.l_orderkey, l.l_suppkey
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        |SELECT s.s_suppkey, s.s_name, count(*) AS numwait
        |FROM late l1 JOIN supplier s ON s.s_suppkey = l1.l_suppkey
        |WHERE EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM late l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey)
        |GROUP BY s.s_suppkey, s.s_name
        |ORDER BY numwait DESC, s_suppkey LIMIT 20""".stripMargin),
      doc = "TPC-H Q21 shape: EXISTS + NOT-EXISTS as co-partitioned semi/anti joins")
  )
}
