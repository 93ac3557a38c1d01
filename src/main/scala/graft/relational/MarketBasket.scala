package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{Declared, Tables}

/** Market-basket co-occurrence — the "customers who bought A also
  * bought B" read (Agrawal & Srikant's association-rule support/lift,
  * VLDB'94) over the order/lineitem fact. The reference's join+agg
  * surface covers the relational half; this is the pair-expansion half
  * every recommender bootstrap needs.
  *
  * Scale shape: pairs expand IN PLACE from each order's sorted
  * distinct item list (one groupBy on the natural l_orderkey
  * partitioning — the same posting-list trick as the q25 Jaccard
  * join), never via a lineitem self-join, so the fact table shuffles
  * once and no shingle-style two-sided join exists. A basket of B
  * items emits B·(B−1)/2 pairs; TPC-H baskets are ≤ 7 lines, and the
  * `maxBasket` guard drops degenerate mega-baskets (a cart crawler, a
  * test account) instead of letting one key emit B² rows — the exact
  * analogue of the hot-shingle document-frequency cap. Support counts
  * and item frequencies are exact integers; lift is ONE double
  * division of three exact integers, floor-quantized to ppm so both
  * engines round the same binary value.
  */
object MarketBasket {

  /** Top co-purchased part pairs by order support, with lift.
    * Output bounded to the top `k` pairs (support desc, then pair). */
  def coPurchase(lineitem: DataFrame, maxBasket: Int = 32, k: Int = 100): DataFrame = {
    // The basket table feeds THREE consumers (pair expansion, item
    // frequencies, the basket count) — persist it so the fact-table
    // shuffle + collect_set aggregation runs once, not three times.
    // MEMORY_AND_DISK: baskets are the post-aggregation grain (one row
    // per order, ≤ maxBasket ints), orders of magnitude smaller than
    // the fact table, and spillable at cluster scale.
    val baskets = lineitem
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("items"))
      .filter(size(col("items")).between(2, maxBasket))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // In-place pair expansion: for sorted items, all (i<j) index pairs.
    val pairs = baskets.select(
      explode(flatten(transform(
        sequence(lit(0), size(col("items")) - 2),
        i => transform(
          sequence(i + 1, size(col("items")) - 1),
          j => struct(element_at(col("items"), i + 1).as("a"),
            element_at(col("items"), j + 1).as("b")))))).as("p"))
      .select(col("p.a"), col("p.b"))
    val support = pairs.groupBy(col("a"), col("b")).agg(count(lit(1)).as("support"))
    // Per-item basket frequency over the SAME capped basket universe.
    val freq = baskets
      .select(explode(col("items")).as("item"))
      .groupBy(col("item")).agg(count(lit(1)).as("n_item"))
    val nBaskets = baskets.groupBy().agg(count(lit(1)).as("n_baskets"))
    support
      .join(broadcast(freq.withColumnRenamed("item", "a").withColumnRenamed("n_item", "n_a")), Seq("a"))
      .join(broadcast(freq.withColumnRenamed("item", "b").withColumnRenamed("n_item", "n_b")), Seq("b"))
      .crossJoin(broadcast(nBaskets))
      .select(col("a"), col("b"), col("support"), col("n_a"), col("n_b"),
        floor(lit(1e6) * col("support").cast("double") * col("n_baskets").cast("double")
          / (col("n_a").cast("double") * col("n_b").cast("double"))).cast("long")
          .as("lift_ppm"))
      .orderBy(col("support").desc, col("a"), col("b"))
      .limit(k)
  }

  val declared: Seq[Declared] = Seq(
    Declared(
      "q143_copurchase",
      (s, dir) => coPurchase(Tables.load(s, dir, "lineitem")),
      Some("""WITH b AS (
        |  SELECT l_orderkey, count(DISTINCT l_partkey) AS sz
        |  FROM lineitem GROUP BY 1 HAVING count(DISTINCT l_partkey) BETWEEN 2 AND 32),
        |it AS (
        |  SELECT DISTINCT l.l_orderkey, l.l_partkey
        |  FROM lineitem l JOIN b ON b.l_orderkey = l.l_orderkey),
        |pr AS (
        |  SELECT x.l_partkey AS a, y.l_partkey AS b, count(*) AS support
        |  FROM it x JOIN it y
        |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        |  GROUP BY 1, 2),
        |f AS (SELECT l_partkey AS item, count(*) AS n_item FROM it GROUP BY 1),
        |n AS (SELECT count(*) AS n_baskets FROM b)
        |SELECT pr.b, pr.a, pr.support, fa.n_item AS n_a, fb.n_item AS n_b,
        |  CAST(floor(1e6 * CAST(pr.support AS DOUBLE) * CAST(n.n_baskets AS DOUBLE)
        |       / (CAST(fa.n_item AS DOUBLE) * CAST(fb.n_item AS DOUBLE))) AS BIGINT)
        |    AS lift_ppm
        |FROM pr
        |JOIN f fa ON fa.item = pr.a
        |JOIN f fb ON fb.item = pr.b
        |CROSS JOIN n
        |ORDER BY pr.support DESC, pr.a, pr.b LIMIT 100""".stripMargin),
      doc = "Market-basket co-purchase pairs with lift (in-place pair expansion, capped baskets)")
  )
}
