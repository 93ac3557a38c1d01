package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{Declared, Tables}

/** The remaining classic TPC-H join shapes expressible over the
  * testdata schema (no partsupp / commitdate columns exist, so Q2, Q4,
  * Q9, Q11, Q12, Q16 and Q20 have no faithful rendering — everything
  * else is covered between here, `Relational` (Q1/Q3/Q6/Q10-adjacent),
  * and `JoinShapes` (Q17/Q19/Q21/Q22)).
  *
  * Each query here stresses a distinct planning property at scale:
  *   - Q5: a CYCLIC join graph (customer↔supplier must share a nation)
  *     — the dims broadcast, the three fact-side joins co-partition on
  *     custkey → orderkey, and the cycle closes with a broadcast-side
  *     equality instead of a second fact shuffle.
  *   - Q7: one dim table joined TWICE under different roles (supplier
  *     nation vs customer nation) — two independent broadcasts of a
  *     25-row table, never a self-join of the fact.
  *   - Q8: conditional aggregation (market share) — the share division
  *     happens once per output row on two exact integer sums, so the
  *     double quotient is bit-identical across engines (no rounding
  *     grid to straddle).
  *   - Q10: top-k over a 4-way join — the order-by-limit sits above one
  *     custkey-partitioned aggregate; TakeOrderedAndProject keeps the
  *     driver's share at k rows.
  *   - Q13: LEFT OUTER join + two-level aggregate (distribution of a
  *     distribution) — the outer join preserves order-less customers as
  *     count 0, a row no inner plan can produce.
  *   - Q15: scalar MAX over an aggregated view joined back to the view
  *     — the 1-row max broadcasts; the view computes ONCE per run into
  *     both sides of the comparison.
  *
  * Money is quantized to integer cents before any sum (the repo-wide
  * idiom), so every aggregate is exact integer math in both engines.
  */
object TpchShapes {

  private def revCents: org.apache.spark.sql.Column =
    round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
      .cast("long")

  /** TPC-H Q5: revenue by nation where customer AND supplier share the
    * nation, within one region and order-date year. */
  def localSupplierVolume(customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame, supplier: DataFrame, nation: DataFrame,
      region: DataFrame): DataFrame = {
    val asiaNations = nation
      .join(broadcast(region.filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val o = orders
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    // fact spine: orders ⋈ customer (custkey), then lineitem (orderkey)
    val oc = o.join(customer.select(col("c_custkey"), col("c_nationkey")),
      col("o_custkey") === col("c_custkey"))
    val l = lineitem.select(col("l_orderkey"), col("l_suppkey"),
      revCents.as("rev_cents"))
    // close the cycle on the broadcast side: s_suppkey AND s_nationkey
    // must both match — no extra fact shuffle.
    oc.join(l, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(asiaNations), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("rev_cents")).cast("double") / 100, 2).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q7: shipping volume between two nations per ship year, both
    * directions. The nation dim joins twice under different roles. */
  def volumeShipping(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, supplier: DataFrame, nation: DataFrame): DataFrame = {
    val n1 = nation.select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
    val n2 = nation.select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))
    val l = lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).as("l_year"), revCents.as("rev_cents"))
    l.join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("sk"))
      .join(broadcast(n2), col("c_nationkey") === col("ck"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(round(sum(col("rev_cents")).cast("double") / 100, 2).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** TPC-H Q8: market share of NATION_3 suppliers in EUROPE's PROMO
    * part orders per order year. Both sums are exact integer cents, so
    * the one share division is bit-identical across engines. */
  def marketShare(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
      supplier: DataFrame, part: DataFrame, nation: DataFrame,
      region: DataFrame): DataFrame = {
    val europeKeys = nation
      .join(broadcast(region.filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val o = orders
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).as("o_year"))
    val l = lineitem.select(col("l_orderkey"), col("l_partkey"),
      col("l_suppkey"), revCents.as("rev_cents"))
      .join(broadcast(part.filter(col("p_type") === "PROMO")
        .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(europeKeys), col("c_nationkey") === col("n_nationkey"), "left_semi")
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("o_year"))
      .agg(
        sum(when(col("s_nationkey") === 3, col("rev_cents")).otherwise(0L))
          .as("nation_cents"),
        sum(col("rev_cents")).as("total_cents"))
      .select(col("o_year"),
        (col("nation_cents").cast("double") / col("total_cents").cast("double"))
          .as("mkt_share"),
        col("nation_cents"), col("total_cents"))
      .orderBy(col("o_year"))
  }

  /** TPC-H Q10: revenue lost to returns per customer in one quarter,
    * top 20. */
  def returnedItemReport(customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame, nation: DataFrame, topN: Int = 20): DataFrame = {
    val o = orders
      .filter(col("o_orderdate") >= lit("1996-04-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val l = lineitem.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), revCents.as("rev_cents"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("rev_cents")).as("lost_cents"))
      .join(customer.select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        round(col("c_acctbal") * 100).cast("long").as("acctbal_cents")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        col("acctbal_cents"),
        round(col("lost_cents").cast("double") / 100, 2).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(topN)
  }

  /** TPC-H Q13: distribution of customers by order count — the LEFT
    * OUTER join keeps zero-order customers, which no inner join can. */
  def customerDistribution(customer: DataFrame, orders: DataFrame): DataFrame = {
    val perCust = customer.select(col("c_custkey"))
      .join(orders.select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_custkey")).as("c_count"))
    perCust.groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q15: supplier(s) achieving the maximum quarterly revenue.
    * The revenue view aggregates once; its 1-row max broadcasts back. */
  def topSupplier(lineitem: DataFrame, supplier: DataFrame): DataFrame = {
    val rev = lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(revCents).as("rev_cents"))
    val best = rev.agg(max(col("rev_cents")).as("best_cents"))
    rev.join(broadcast(best), col("rev_cents") === col("best_cents"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        round(col("rev_cents").cast("double") / 100, 2).as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q14: promotion revenue share for one ship month. The
    * distinctive planning property vs Q8: the aggregate collapses to a
    * SINGLE row, so the share division runs exactly once, on two exact
    * integer cent sums over the same filtered rows — and the one-month
    * shipdate filter must reach the parquet scan (`PushedFilters`), so
    * at 100 TB the job reads ~1/84th of lineitem before the join. The
    * part side carries only (p_partkey, is_promo) into a broadcast. */
  def promoRevenue(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val l = lineitem
      .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .select(col("l_partkey"), revCents.as("rev_cents"))
    l.join(broadcast(part.select(col("p_partkey"),
        (col("p_type") === "PROMO").as("is_promo"))),
        col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("is_promo"), col("rev_cents")).otherwise(0L)).as("promo_cents"),
        sum(col("rev_cents")).as("total_cents"))
      .select(col("promo_cents"), col("total_cents"),
        (lit(100.0) * col("promo_cents").cast("double") /
          col("total_cents").cast("double")).as("promo_share"))
  }

  private val REV =
    "CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)"

  val declared: Seq[Declared] = Seq(
    Declared(
      "q120_local_volume",
      (s, dir) => localSupplierVolume(Tables.load(s, dir, "customer"),
        Tables.load(s, dir, "orders"), Tables.load(s, dir, "lineitem"),
        Tables.load(s, dir, "supplier"), Tables.load(s, dir, "nation"),
        Tables.load(s, dir, "region")),
      Some(s"""SELECT n_name,
        |  round(CAST(sum($REV) AS DOUBLE) / 100, 2) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin),
      doc = "TPC-H Q5 shape: cyclic join graph closed on the broadcast side"),

    Declared(
      "q121_volume_shipping",
      (s, dir) => volumeShipping(Tables.load(s, dir, "lineitem"),
        Tables.load(s, dir, "orders"), Tables.load(s, dir, "customer"),
        Tables.load(s, dir, "supplier"), Tables.load(s, dir, "nation")),
      Some(s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
        |  round(CAST(sum($REV) AS DOUBLE) / 100, 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin),
      doc = "TPC-H Q7 shape: one dim joined twice under different roles"),

    Declared(
      "q122_market_share",
      (s, dir) => marketShare(Tables.load(s, dir, "lineitem"),
        Tables.load(s, dir, "orders"), Tables.load(s, dir, "customer"),
        Tables.load(s, dir, "supplier"), Tables.load(s, dir, "part"),
        Tables.load(s, dir, "nation"), Tables.load(s, dir, "region")),
      Some(s"""SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
        |  CAST(sum(CASE WHEN s_nationkey = 3 THEN $REV ELSE 0 END) AS DOUBLE)
        |    / CAST(sum($REV) AS DOUBLE) AS mkt_share,
        |  CAST(sum(CASE WHEN s_nationkey = 3 THEN $REV ELSE 0 END) AS BIGINT) AS nation_cents,
        |  CAST(sum($REV) AS BIGINT) AS total_cents
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE p_type = 'PROMO'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND c_nationkey IN (SELECT n_nationkey FROM nation JOIN region
        |        ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE')
        |GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "TPC-H Q8 shape: market share via conditional aggregation"),

    Declared(
      "q123_returned_items",
      (s, dir) => returnedItemReport(Tables.load(s, dir, "customer"),
        Tables.load(s, dir, "orders"), Tables.load(s, dir, "lineitem"),
        Tables.load(s, dir, "nation")),
      Some(s"""SELECT c_custkey, c_name, n_name,
        |  CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents,
        |  round(CAST(sum($REV) AS DOUBLE) / 100, 2) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-04-01'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin),
      doc = "TPC-H Q10 shape: top-k over a 4-way join"),

    Declared(
      "q124_customer_distribution",
      (s, dir) => customerDistribution(Tables.load(s, dir, "customer"),
        Tables.load(s, dir, "orders")),
      Some("""SELECT c_count, count(*) AS custdist
        |FROM (SELECT c_custkey, count(o_custkey) AS c_count
        |      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |      GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin),
      doc = "TPC-H Q13 shape: outer join + two-level aggregate"),

    Declared(
      "q125_top_supplier",
      (s, dir) => topSupplier(Tables.load(s, dir, "lineitem"),
        Tables.load(s, dir, "supplier")),
      Some(s"""WITH rev AS (
        |  SELECT l_suppkey, sum($REV) AS rev_cents
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name,
        |  round(CAST(rev_cents AS DOUBLE) / 100, 2) AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev_cents = (SELECT max(rev_cents) FROM rev)
        |ORDER BY s_suppkey""".stripMargin),
      doc = "TPC-H Q15 shape: scalar max over an aggregated view"),

    Declared(
      "q138_promo_revenue",
      (s, dir) => promoRevenue(Tables.load(s, dir, "lineitem"),
        Tables.load(s, dir, "part")),
      Some(s"""SELECT
        |  CAST(sum(CASE WHEN p_type = 'PROMO' THEN $REV ELSE 0 END) AS BIGINT) AS promo_cents,
        |  CAST(sum($REV) AS BIGINT) AS total_cents,
        |  100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN $REV ELSE 0 END) AS DOUBLE)
        |    / CAST(sum($REV) AS DOUBLE) AS promo_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
        |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin),
      doc = "TPC-H Q14 shape: single-row promo share, month-pruned scan + broadcast dim")
  )
}
