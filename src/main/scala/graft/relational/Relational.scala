package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Declared, Tables}

/** Declared relational query inventory — covers SURVEY.md §2's
  * projections/filters, joins (inner/outer/semi/anti/range), aggregates
  * (hash agg, distinct, rollup), windows (rank/lag/running), sorts,
  * limits and set operations over the TPC-H-ish testdata tables, each
  * paired with an equivalent DuckDB oracle SQL.
  *
  * Determinism rules (SURVEY.md §5.3): every query ends in ORDER BY on
  * a unique key; money math is done in exact integer cents (2-decimal
  * doubles, verified) so sums are order-independent and bit-identical
  * across engines; mixed int/long widths are aligned by explicit casts
  * on the DuckDB side.
  */
object Relational {

  /** Exact integer cents — shared definition (graft.DuckSql). */
  private def cents(c: Column): Column = graft.DuckSql.centsCol(c)

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def dCents(col: String): String = graft.DuckSql.cents(col)

  val declared: Seq[Declared] = Seq(

    // ----- aggregation: TPC-H Q1-style pricing summary (§2.4) -----
    Declared(
      "q01_pricing_summary",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          // Direct timestamp comparison (≡ date ≤ 1998-09-02) so the
          // predicate reaches the parquet scan's PushedFilters — a
          // to_date() wrapper would force a full read at 100 TB.
          .filter(col("l_shipdate") < lit("1998-09-03").cast("timestamp"))
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            (sum(cents(col("l_quantity"))).cast("double") / 100.0).as("sum_qty"),
            (sum(cents(col("l_extendedprice"))).cast("double") / 100.0).as("sum_base_price"),
            (sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
              .cast("double") / 10000.0).as("sum_disc_price"),
            (sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))
              * (lit(100L) + cents(col("l_tax")))).cast("double") / 1000000.0).as("sum_charge"),
            (sum(cents(col("l_quantity"))).cast("double") / (count(lit(1)) * 100.0)).as("avg_qty"),
            (sum(cents(col("l_extendedprice"))).cast("double") / (count(lit(1)) * 100.0)).as("avg_price"),
            (sum(cents(col("l_discount"))).cast("double") / (count(lit(1)) * 100.0)).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
        |  CAST(sum(${dCents("l_quantity")}) AS DOUBLE) / 100.0 AS sum_qty,
        |  CAST(sum(${dCents("l_extendedprice")}) AS DOUBLE) / 100.0 AS sum_base_price,
        |  CAST(sum(${dCents("l_extendedprice")} * (100 - ${dCents("l_discount")})) AS DOUBLE) / 10000.0 AS sum_disc_price,
        |  CAST(sum(${dCents("l_extendedprice")} * (100 - ${dCents("l_discount")}) * (100 + ${dCents("l_tax")})) AS DOUBLE) / 1000000.0 AS sum_charge,
        |  CAST(sum(${dCents("l_quantity")}) AS DOUBLE) / (count(*) * 100.0) AS avg_qty,
        |  CAST(sum(${dCents("l_extendedprice")}) AS DOUBLE) / (count(*) * 100.0) AS avg_price,
        |  CAST(sum(${dCents("l_discount")}) AS DOUBLE) / (count(*) * 100.0) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1998-09-03 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      doc = "Hash aggregation with exact-cents money math (§2.4)"),

    // ----- projection + filter, pushed to the parquet scan (§2.2) -----
    Declared(
      "q02_filter_project",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp")
          && col("l_quantity") >= 45)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), col("l_returnflag"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00' AND l_quantity >= 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin),
      doc = "Predicate + projection pushdown into the parquet scan (§2.2)"),

    // ----- inner equi-join + aggregate (§2.3) -----
    Declared(
      "q03_join_agg",
      (s, dir) => t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          (sum(cents(col("o_totalprice"))).cast("double") / 100.0).as("revenue"))
        .orderBy(col("c_mktsegment")),
      Some(s"""SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(${dCents("o_totalprice")}) AS DOUBLE) / 100.0 AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),
      doc = "Inner equi-join (broadcast-able dim) + hash agg (§2.3/§2.4)"),

    // ----- left outer join (§2.3 [absent] row) -----
    Declared(
      "q04_outer_join",
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          (sum(coalesce(cents(col("o_totalprice")), lit(0L))).cast("double") / 100.0)
            .as("total_spent"))
        .orderBy(col("c_custkey")),
      Some(s"""SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
        |  CAST(sum(coalesce(${dCents("o_totalprice")}, 0)) AS DOUBLE) / 100.0 AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin),
      doc = "Left outer join preserving customers without orders (§2.3)"),

    // ----- left semi join / EXISTS (§2.3 [absent] row) -----
    Declared(
      "q05_semi_join",
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin),
      doc = "Left-semi join = EXISTS (§2.3)"),

    // ----- left anti join / NOT EXISTS (§2.3 [absent] row) -----
    Declared(
      "q06_anti_join",
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin),
      doc = "Left-anti join = NOT EXISTS (§2.3)"),

    // ----- non-equi range join (§2.3 [absent] row) -----
    Declared(
      "q07_range_join",
      (s, dir) => t(s, dir, "customer")
        .join(broadcast(t(s, dir, "supplier").select(col("s_suppkey"), col("s_acctbal"))),
          col("c_acctbal") >= col("s_acctbal") - 100
            && col("c_acctbal") <= col("s_acctbal") + 100)
        .groupBy(col("s_suppkey"))
        .agg(count(lit(1)).as("n_close"),
          (sum(cents(col("c_acctbal"))).cast("double") / 100.0).as("sum_bal"))
        .orderBy(col("s_suppkey")),
      Some(s"""SELECT s_suppkey, count(*) AS n_close,
        |  CAST(sum(${dCents("c_acctbal")}) AS DOUBLE) / 100.0 AS sum_bal
        |FROM supplier JOIN customer
        |  ON c_acctbal >= s_acctbal - 100 AND c_acctbal <= s_acctbal + 100
        |GROUP BY s_suppkey ORDER BY s_suppkey""".stripMargin),
      doc = "Range (non-equi) join, small side broadcast (§2.3)"),

    // ----- rollup (§2.4 [absent] row) -----
    Declared(
      "q08_rollup",
      (s, dir) => t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          (sum(cents(col("l_quantity"))).cast("double") / 100.0).as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus")),
      Some(s"""SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(${dCents("l_quantity")}) AS DOUBLE) / 100.0 AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin),
      doc = "ROLLUP grouping sets (§2.4)"),

    // ----- distinct aggregation (§2.4 [absent] row) -----
    Declared(
      "q09_distinct_agg",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      doc = "Exact distinct aggregation (§2.4)"),

    // HLL sketch — approximate, so no SQL oracle (rows-only check).
    Declared(
      "q09b_approx_distinct",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"))
        .orderBy(col("l_returnflag")),
      None,
      doc = "HLL approx_count_distinct (§2.4; sketch ⇒ rows-only check)"),

    // ----- ranking window + top-k per key (§2.5) -----
    Declared(
      "q10_window_rank",
      (s, dir) => {
        val byPrice = Window.partitionBy(col("p_brand"))
          .orderBy(col("p_retailprice").desc, col("p_partkey"))
        val byPriceOnly = Window.partitionBy(col("p_brand"))
          .orderBy(col("p_retailprice").desc)
        t(s, dir, "part")
          .withColumn("rn", row_number().over(byPrice))
          .withColumn("rk", rank().over(byPriceOnly))
          .filter(col("rn") <= 3)
          .select(col("p_brand"), col("rn"), col("rk"), col("p_partkey"), col("p_retailprice"))
          .orderBy(col("p_brand"), col("rn"))
      },
      Some("""SELECT p_brand, CAST(rn AS INTEGER) AS rn, CAST(rk AS INTEGER) AS rk,
        |       p_partkey, p_retailprice
        |FROM (SELECT p_brand, p_partkey, p_retailprice,
        |        row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn,
        |        rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS rk
        |      FROM part)
        |WHERE rn <= 3 ORDER BY p_brand, rn""".stripMargin),
      doc = "row_number/rank windows, top-3 per brand (§2.5)"),

    // ----- running-total window frame (§2.5 [absent] row) -----
    Declared(
      "q11_window_running",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        t(s, dir, "orders").select(
          col("o_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          (sum(cents(col("o_totalprice")))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double") / 100.0).as("running_total"),
          row_number().over(w).as("order_seq"))
          .orderBy(col("o_custkey"), col("order_seq"))
      },
      Some(s"""SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |  CAST(sum(${dCents("o_totalprice")}) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0 AS running_total,
        |  CAST(row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS order_seq
        |FROM orders ORDER BY o_custkey, order_seq""".stripMargin),
      doc = "Cumulative sum window frame in exact cents (§2.5)"),

    // ----- lag/lead analytic window (§2.5 [absent] row) -----
    Declared(
      "q12_window_lag",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        t(s, dir, "orders").select(
          col("o_custkey"), col("o_orderkey"),
          datediff(to_date(col("o_orderdate")), to_date(lag(col("o_orderdate"), 1).over(w)))
            .as("days_since_prev"),
          lag(col("o_orderkey"), 1).over(w).as("prev_order"),
          lead(col("o_orderkey"), 1).over(w).as("next_order"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey,
        |  CAST(date_diff('day',
        |    CAST(lag(o_orderdate) OVER w AS DATE),
        |    CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_prev,
        |  lag(o_orderkey) OVER w AS prev_order,
        |  lead(o_orderkey) OVER w AS next_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin),
      doc = "lag/lead analytics with day deltas (§2.5)"),

    // ----- global sort + limit (§2.6) -----
    Declared(
      "q13_top_orders",
      (s, dir) => t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(15)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderstatus")),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 15""".stripMargin),
      doc = "Global top-k via sort + limit (TakeOrderedAndProject) (§2.6)"),

    // ----- set operations (§2.7 [absent] row) -----
    Declared(
      "q14_setops",
      (s, dir) => {
        val cn = t(s, dir, "customer").select(col("c_nationkey").as("nk")).distinct()
        val sn = t(s, dir, "supplier").select(col("s_nationkey").as("nk")).distinct()
        cn.intersect(sn).withColumn("tag", lit("both"))
          .unionAll(cn.except(sn).withColumn("tag", lit("customer_only")))
          .unionAll(sn.except(cn).withColumn("tag", lit("supplier_only")))
          .select(col("tag"), col("nk"))
          .orderBy(col("tag"), col("nk"))
      },
      Some("""SELECT tag, nk FROM (
        |  SELECT 'both' AS tag, nk FROM (
        |    SELECT DISTINCT c_nationkey AS nk FROM customer
        |    INTERSECT SELECT DISTINCT s_nationkey FROM supplier)
        |  UNION ALL
        |  SELECT 'customer_only' AS tag, nk FROM (
        |    SELECT DISTINCT c_nationkey AS nk FROM customer
        |    EXCEPT SELECT DISTINCT s_nationkey FROM supplier)
        |  UNION ALL
        |  SELECT 'supplier_only' AS tag, nk FROM (
        |    SELECT DISTINCT s_nationkey AS nk FROM supplier
        |    EXCEPT SELECT DISTINCT c_nationkey FROM customer))
        |ORDER BY tag, nk""".stripMargin),
      doc = "UNION ALL / INTERSECT / EXCEPT (§2.7)"),

    // ----- multi-way join through the dimension chain (§2.3) -----
    Declared(
      "q15_multi_join",
      (s, dir) => t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_orders"),
          (sum(cents(col("o_totalprice"))).cast("double") / 100.0).as("revenue"))
        .orderBy(col("r_name"), col("n_name")),
      Some(s"""SELECT r_name, n_name, count(*) AS n_orders,
        |  CAST(sum(${dCents("o_totalprice")}) AS DOUBLE) / 100.0 AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin),
      doc = "4-way join, dims broadcast (§2.3)"),

    // ----- string scalar surface (§2.8 [absent] row) -----
    Declared(
      "q16_string_funcs",
      (s, dir) => t(s, dir, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        length(col("p_name")).as("name_len"),
        substring(col("p_name"), 1, 8).as("name_prefix"),
        concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("no_vowels"),
        regexp_extract(col("p_name"), "^([a-z]+)", 1).as("first_word"))
        .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey, upper(p_name) AS name_upper,
        |  CAST(length(p_name) AS INTEGER) AS name_len,
        |  substr(p_name, 1, 8) AS name_prefix,
        |  concat_ws('/', p_brand, p_type) AS brand_type,
        |  regexp_replace(p_name, '[aeiou]', '', 'g') AS no_vowels,
        |  regexp_extract(p_name, '^([a-z]+)', 1) AS first_word
        |FROM part ORDER BY p_partkey""".stripMargin),
      doc = "String scalar functions (§2.8)"),

    // ----- date scalar surface (§2.8 [absent] row) -----
    Declared(
      "q17_date_funcs",
      (s, dir) => t(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
        datediff(lit("2000-01-01").cast("date"), to_date(col("o_orderdate"))).as("days_to_y2k"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS yr,
        |  CAST(month(o_orderdate) AS INTEGER) AS mo,
        |  CAST(day(o_orderdate) AS INTEGER) AS dom,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INTEGER) AS days_to_y2k
        |FROM orders ORDER BY o_orderkey""".stripMargin),
      doc = "Date/time scalar functions (§2.8)"),

    // ----- math scalar surface (§2.8 [absent] row) -----
    Declared(
      "q18_math_funcs",
      (s, dir) => t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - 0.05).as("abs_disc"),
        ceil(col("l_extendedprice")).as("price_ceil"),
        floor(col("l_quantity")).as("qty_floor"),
        round(sqrt(col("l_extendedprice")), 6).as("price_sqrt"),
        round(log(col("l_extendedprice")), 6).as("price_ln"),
        pmod(col("l_orderkey"), lit(7L)).as("key_mod"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber,
        |  abs(l_discount - 0.05) AS abs_disc,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        |  CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
        |  round(sqrt(l_extendedprice), 6) AS price_sqrt,
        |  round(ln(l_extendedprice), 6) AS price_ln,
        |  l_orderkey % 7 AS key_mod
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin),
      doc = "Math scalar functions; sqrt exact per IEEE, ln rounded (§2.8)"),

    // ----- array scalar surface over vectors (§2.8 + §2.1) -----
    Declared(
      "q19_array_funcs",
      (s, dir) => {
        import graft.linalg.Distances
        val emb = t(s, dir, "embeddings")
        emb.select(
          col("vec_id"),
          size(col("embedding")).as("dim"),
          round(element_at(col("embedding"), 1).cast("double"), 6).as("first_val"),
          round(Distances.l2Norm(col("embedding")), 6).as("l2_norm"),
          round(aggregate(slice(col("embedding"), 1, 8), lit(0.0),
            (acc, v) => acc + v.cast("double")), 6).as("head8_sum"),
          col("label"))
          .orderBy(col("vec_id"))
      },
      Some(s"""SELECT vec_id, CAST(len(embedding) AS INTEGER) AS dim,
        |  round(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
        |  round(${graft.DuckSql.l2Norm("embedding")}, 6) AS l2_norm,
        |  round(list_reduce(list_transform(range(8), i -> CAST(embedding[i+1] AS DOUBLE)),
        |        (x, y) -> x + y), 6) AS head8_sum,
        |  label
        |FROM embeddings ORDER BY vec_id""".stripMargin),
      doc = "Array functions + deterministic fold over vectors (§2.8)"),

    // ----- cube grouping sets (§2.4 [absent] row) -----
    Declared(
      "q08b_cube",
      (s, dir) => t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          (sum(cents(col("o_totalprice"))).cast("double") / 100.0).as("revenue"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority")),
      Some(s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(${dCents("o_totalprice")}) AS DOUBLE) / 100.0 AS revenue
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin),
      doc = "CUBE grouping sets (§2.4)"),

    // ----- deterministic TABLESAMPLE (§2.10 [absent] row) -----
    // df.sample(seed) is engine-specific, so the declared sample is a
    // content-hash Bernoulli sample: md5 of the key — identical row
    // set in any engine, statistically a ~10% sample, trivially
    // distributed (pure row-local predicate, no shuffle).
    Declared(
      "q37_hash_sample",
      (s, dir) => t(s, dir, "orders")
        .filter(conv(substring(md5(col("o_orderkey").cast("string")), 1, 6), 16, 10)
          .cast("long") % 100 < 10)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 6)) AS BIGINT) % 100 < 10
        |ORDER BY o_orderkey""".stripMargin),
      doc = "Deterministic content-hash Bernoulli sample (§2.10)"),

    // ----- RANGE window frame over a numeric time axis (§2.5) -----
    Declared(
      "q50_range_frame",
      (s, dir) => {
        val days = datediff(to_date(col("o_orderdate")), lit("1990-01-01").cast("date"))
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("day_n"))
          .rangeBetween(-30, Window.currentRow)
        t(s, dir, "orders")
          .withColumn("day_n", days)
          .select(col("o_custkey"), col("o_orderkey"),
            (sum(cents(col("o_totalprice"))).over(w).cast("double") / 100.0)
              .as("rev_30d"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some(s"""SELECT o_custkey, o_orderkey,
        |  CAST(sum(${dCents("o_totalprice")}) OVER (PARTITION BY o_custkey
        |    ORDER BY date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
        |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0 AS rev_30d
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin),
      doc = "RANGE frame: trailing-30-day revenue per customer (§2.5)"),

    // ----- remaining ranking/analytic family (§2.5) -----
    Declared(
      "q51_rank_family",
      (s, dir) => {
        val w = Window.partitionBy(col("o_orderstatus")).orderBy(col("o_orderkey"))
        t(s, dir, "orders").select(
          col("o_orderstatus"), col("o_orderkey"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"),
          ntile(4).over(w).as("quartile"),
          first(col("o_orderkey")).over(w).as("first_key"),
          nth_value(col("o_orderkey"), 2).over(w).as("second_key"))
          .orderBy(col("o_orderstatus"), col("o_orderkey"))
      },
      Some("""SELECT o_orderstatus, o_orderkey,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |  first_value(o_orderkey) OVER w AS first_key,
        |  nth_value(o_orderkey, 2) OVER w AS second_key
        |FROM orders WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey)
        |ORDER BY o_orderstatus, o_orderkey""".stripMargin),
      doc = "percent_rank/cume_dist/ntile/first/nth_value (§2.5)"),

    // ----- map type construction + lookup (§2.8) -----
    // Map output itself is never emitted (entry order is engine-
    // dependent); only scalar lookups leave the query.
    Declared(
      "q52_map_funcs",
      (s, dir) => t(s, dir, "events")
        .groupBy(col("user_id"), col("event_type")).count()
        .groupBy(col("user_id"))
        .agg(map_from_entries(collect_list(struct(col("event_type"), col("count"))))
          .as("m"))
        .select(col("user_id"),
          element_at(col("m"), "click").as("n_click"),
          element_at(col("m"), "error").as("n_error"),
          size(map_keys(col("m"))).as("n_types"))
        .orderBy(col("user_id")),
      Some("""WITH c AS (
        |  SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2),
        |m AS (SELECT user_id, map(list(event_type), list(n)) AS m
        |      FROM c GROUP BY user_id)
        |SELECT user_id,
        |  element_at(m, 'click')[1] AS n_click,
        |  element_at(m, 'error')[1] AS n_error,
        |  CAST(cardinality(m) AS INTEGER) AS n_types
        |FROM m ORDER BY user_id""".stripMargin),
      doc = "Map construction + keyed lookup, scalar outputs only (§2.8)"),

    // ----- TPC-H Q3 shape: filtered 3-way join + agg + top-k (§2.3/§2.4/§2.6) -----
    Declared(
      "q53_shipping_priority",
      (s, dir) => t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .join(t(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        // date > 1998-01-01 ≡ ts ≥ 1998-01-02 00:00 (pushdown-friendly)
        .filter(col("l_shipdate") >= lit("1998-01-02").cast("timestamp"))
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
        .agg((sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
          .cast("double") / 10000.0).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(20),
      Some(s"""SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |  CAST(sum(${dCents("l_extendedprice")} * (100 - ${dCents("l_discount")})) AS DOUBLE)
        |    / 10000.0 AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate >= TIMESTAMP '1998-01-02 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 20""".stripMargin),
      doc = "TPC-H Q3 shape: selective joins → agg → global top-k (§2.3/2.6)"),

    // ----- argmin/argmax aggregation (§2.4) -----
    // max_by needs a unique ordering value for determinism: compose
    // (cents, key) into one bigint so ties cannot occur. The key
    // multiplier must exceed any orderkey (10^9 covers far beyond the
    // bench scale; cents·10^9 ≈ 5·10^16 stays inside int64).
    Declared(
      "q46_argmax",
      (s, dir) => {
        def ord = cents(col("o_totalprice")) * 1000000000L + col("o_orderkey")
        t(s, dir, "orders")
          .groupBy(col("o_orderstatus"))
          .agg(max_by(col("o_orderkey"), ord).as("top_order"),
            min_by(col("o_orderkey"), ord).as("bottom_order"))
          .orderBy(col("o_orderstatus"))
      },
      Some(s"""SELECT o_orderstatus,
        |  arg_max(o_orderkey, ${dCents("o_totalprice")} * 1000000000 + o_orderkey) AS top_order,
        |  arg_min(o_orderkey, ${dCents("o_totalprice")} * 1000000000 + o_orderkey) AS bottom_order
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),
      doc = "arg_max/arg_min with tie-free composite ordering (§2.4)"),

    // ----- exact percentile (§2.4) -----
    Declared(
      "q47_percentile",
      (s, dir) => t(s, dir, "orders")
        .withColumn("c", cents(col("o_totalprice")))
        .groupBy(col("o_orderstatus"))
        .agg(
          round(expr("percentile(c, 0.5)") / 100.0, 2).as("median_price"),
          round(expr("percentile(c, 0.9)") / 100.0, 2).as("p90_price"))
        .orderBy(col("o_orderstatus")),
      Some(s"""SELECT o_orderstatus,
        |  round(quantile_cont(${dCents("o_totalprice")}, 0.5) / 100.0, 2) AS median_price,
        |  round(quantile_cont(${dCents("o_totalprice")}, 0.9) / 100.0, 2) AS p90_price
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),
      doc = "Exact interpolated percentiles over integer cents (§2.4)"),

    // ----- approximate percentile — the 100 TB path (§2.4) -----
    Declared(
      // exact percentile shuffles every value per group; the
      // QuantileSummaries sketch merges map-side with bounded error
      // (rows-only: sketch merge order is partition-dependent, so not
      // hash-mirrorable; spec gates it within 1% of exact).
      "q47b_percentile_approx",
      (s, dir) => t(s, dir, "orders")
        .withColumn("c", cents(col("o_totalprice")))
        .groupBy(col("o_orderstatus"))
        .agg(
          round(expr("percentile_approx(c, 0.5, 10000)") / 100.0, 2).as("median_price"),
          round(expr("percentile_approx(c, 0.9, 10000)") / 100.0, 2).as("p90_price"))
        .orderBy(col("o_orderstatus")),
      None,
      doc = "Sketch percentiles (map-side mergeable; scale path of q47)"),

    // ----- ordered string aggregation / listagg (§2.4) -----
    Declared(
      "q48_listagg",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(array_join(array_sort(collect_set(col("l_linestatus"))), ",").as("statuses"),
          countDistinct(col("l_linestatus")).as("n_statuses"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
        |  string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses,
        |  count(DISTINCT l_linestatus) AS n_statuses
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      doc = "Deterministic ordered listagg (§2.4)"),

    // ----- generator / UNNEST (§2.12 flatMap row) -----
    Declared(
      "q45_posexplode",
      (s, dir) => Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy(col("pos"))
        .agg(count(lit(1)).as("n"),
          min(col("x")).cast("double").as("min_x"),
          max(col("x")).cast("double").as("max_x"))
        .orderBy(col("pos")),
      Some("""SELECT CAST(i AS INTEGER) AS pos, count(*) AS n,
        |  CAST(min(embedding[i + 1]) AS DOUBLE) AS min_x,
        |  CAST(max(embedding[i + 1]) AS DOUBLE) AS max_x
        |FROM embeddings, (SELECT unnest(range(64)) AS i)
        |GROUP BY i ORDER BY pos""".stripMargin),
      doc = "posexplode/UNNEST generator + per-position extremes (§2.12)"),

    // ----- as-of (time-series) join (§2.3 [absent] row) -----
    Declared(
      "q43_asof_join",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("event_id")).as("click_id"))
        AsOfJoin.asofJoin(purchases, clicks, "user_id", "ts", "ts", Seq("click_id"))
          .select(col("event_id"), col("user_id"), col("asof_click_id"))
          .orderBy(col("event_id"))
      },
      Some("""WITH purchases AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |clicks AS (
        |  SELECT user_id, ts, max(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY user_id, ts)
        |SELECT p.event_id, p.user_id, c.click_id AS asof_click_id
        |FROM purchases p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin),
      doc = "As-of join: latest prior click per purchase (§2.3; union+window composition)"),

    // ----- GROUPING SETS through the SQL surface (§2.4) -----
    Declared(
      "q44_grouping_sets",
      (s, dir) => {
        t(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
        s.sql("""SELECT l_returnflag, l_linestatus, count(*) AS n
          |FROM lineitem_v
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
          |                        (l_returnflag, l_linestatus))
          |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
          |""".stripMargin)
      },
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
        |                        (l_returnflag, l_linestatus))
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin),
      doc = "Explicit GROUPING SETS via spark.sql (§2.4)"),

    // ----- fuzzy string matching (north-star text dedup adjunct) -----
    Declared(
      "q40_levenshtein_pairs",
      (s, dir) => {
        val p1 = t(s, dir, "part").select(col("p_brand"),
          col("p_partkey").as("k1"), col("p_name").as("n1"))
          .filter(col("k1") % 20 === 0)
        val p2 = t(s, dir, "part").select(col("p_brand").as("b2"),
          col("p_partkey").as("k2"), col("p_name").as("n2"))
        p1.join(p2, col("p_brand") === col("b2") && col("k1") < col("k2"))
          .withColumn("lev", levenshtein(col("n1"), col("n2")))
          .filter(col("lev") <= 4)
          .select(col("k1"), col("k2"), col("lev"))
          .orderBy(col("k1"), col("k2"))
      },
      Some("""SELECT a.p_partkey AS k1, b.p_partkey AS k2,
        |  CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS lev
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        |WHERE a.p_partkey % 20 = 0 AND levenshtein(a.p_name, b.p_name) <= 4
        |ORDER BY k1, k2""".stripMargin),
      doc = "Levenshtein fuzzy-match pairs within brand blocks (§2.8)"),

    // ----- conditional aggregation / pivot shape (§2.4) -----
    Declared(
      "q41_pivot",
      (s, dir) => t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .withColumnsRenamed(Map("F" -> "n_f", "O" -> "n_o", "P" -> "n_p"))
        .orderBy(col("o_orderpriority")),
      Some("""SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      doc = "Pivot / conditional aggregation (§2.4)"),

    // ----- summary statistics with exact arithmetic (§2.4) -----
    // stddev built explicitly from exact integer sums, so both engines
    // compute the identical closed form (library stddev accumulations
    // differ in rounding; this does not).
    Declared(
      "q42_stats",
      (s, dir) => {
        val c = cents(col("o_totalprice"))
        t(s, dir, "orders")
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            // c² sums past int64 at scale — exact decimal accumulation
            // (DuckDB's BIGINT sum widens to HUGEINT by itself)
            sum(c).as("s"), sum((c * c).cast("decimal(38,0)")).as("ss"),
            min(col("o_totalprice")).as("min_price"),
            max(col("o_totalprice")).as("max_price"))
          .select(col("o_orderstatus"), col("n"),
            (col("s").cast("double") / (col("n") * 100.0)).as("mean_price"),
            round(sqrt((col("ss").cast("double")
              - col("s").cast("double") * col("s").cast("double") / col("n"))
              / (col("n") - 1)) / 100.0, 4).as("stddev_price"),
            col("min_price"), col("max_price"))
          .orderBy(col("o_orderstatus"))
      },
      Some(s"""SELECT o_orderstatus, n,
        |  CAST(s AS DOUBLE) / (n * 100.0) AS mean_price,
        |  round(sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
        |        / (n - 1)) / 100.0, 4) AS stddev_price,
        |  min_price, max_price
        |FROM (SELECT o_orderstatus, count(*) AS n,
        |        sum(${dCents("o_totalprice")}) AS s,
        |        sum(${dCents("o_totalprice")} * ${dCents("o_totalprice")}) AS ss,
        |        min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
        |      FROM orders GROUP BY o_orderstatus)
        |ORDER BY o_orderstatus""".stripMargin),
      doc = "Summary stats; stddev from exact integer moments (§2.4)"),

    // ----- JSON extraction (§2.8 [absent] row) -----
    Declared(
      "q20_json_funcs",
      (s, dir) => t(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"),
          (sum(col("k")).cast("double") / count(lit(1))).as("avg_k"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type, count(*) AS n,
        |  CAST(sum(k) AS BIGINT) AS sum_k, min(k) AS min_k, max(k) AS max_k,
        |  CAST(sum(k) AS DOUBLE) / count(*) AS avg_k
        |FROM (SELECT event_type,
        |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |      FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin),
      doc = "JSON field extraction from events.props (§2.8)"),

    // ----- TPC-H Q18 shape: HAVING-filtered agg driving a join (§2.3/2.4) -----
    // The lineitem agg and the orders join share the orderkey shuffle
    // key; the HAVING filter shrinks the agg output to the rare heavy
    // orders BEFORE any join, and AQE broadcasts that survivor set. At
    // 100 TB nothing but the survivors ever re-shuffles.
    Declared(
      "q85_big_orders",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(cents(col("l_quantity"))).as("qty_c"))
        .filter(col("qty_c") > 250 * 100L)
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          col("o_totalprice"),
          (col("qty_c").cast("double") / 100.0).as("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(50),
      Some(s"""SELECT c_name, c_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS order_date, o_totalprice,
        |  CAST(qty_c AS DOUBLE) / 100.0 AS total_qty
        |FROM (SELECT l_orderkey, sum(${dCents("l_quantity")}) AS qty_c
        |      FROM lineitem GROUP BY 1 HAVING sum(${dCents("l_quantity")}) > 25000)
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""".stripMargin),
      doc = "TPC-H Q18 shape: HAVING-filtered agg → join → top-k (§2.3/2.4)"),

    // ----- TPC-H Q14 shape: conditional-agg revenue share (§2.4) -----
    Declared(
      "q86_promo_share",
      (s, dir) => {
        val rev = cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))
        t(s, dir, "lineitem")
          .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
          .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
          .agg(
            (sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0L)))
              .cast("double") / 10000.0).as("promo_revenue"),
            (sum(rev).cast("double") / 10000.0).as("total_revenue"),
            round(sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0L)))
              .cast("double") * 100.0 / sum(rev), 4).as("promo_pct"))
          .orderBy(col("ship_month"))
      },
      Some(s"""SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
        |  CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) AS DOUBLE)
        |    / 10000.0 AS promo_revenue,
        |  CAST(sum(rev) AS DOUBLE) / 10000.0 AS total_revenue,
        |  round(CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) AS DOUBLE)
        |    * 100.0 / sum(rev), 4) AS promo_pct
        |FROM (SELECT l_shipdate, p_type,
        |        ${dCents("l_extendedprice")} * (100 - ${dCents("l_discount")}) AS rev
        |      FROM lineitem JOIN part ON l_partkey = p_partkey)
        |GROUP BY 1 ORDER BY ship_month""".stripMargin),
      doc = "TPC-H Q14 shape: promo revenue share per ship month (§2.4)"),

    // ----- unpivot: wide → long (q41 pivot's inverse, §2.4) -----
    Declared(
      "q93_unpivot",
      (s, dir) => {
        val wide = t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(
            sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("F"),
            sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("O"),
            sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("P"))
        wide.unpivot(Array(col("n_name")),
            Array(col("F"), col("O"), col("P")), "status", "n_orders")
          .orderBy(col("n_name"), col("status"))
      },
      Some("""WITH w AS (SELECT n_name,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f,
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS o,
        |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS p
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name)
        |SELECT n_name, 'F' AS status, f AS n_orders FROM w
        |UNION ALL SELECT n_name, 'O', o FROM w
        |UNION ALL SELECT n_name, 'P', p FROM w
        |ORDER BY n_name, status""".stripMargin),
      doc = "Unpivot wide status counts back to long form (§2.4, q41's inverse)")
  )
}
