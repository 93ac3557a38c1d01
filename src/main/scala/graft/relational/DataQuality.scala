package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Declared, Tables}

/** Data-quality audit — the constraint sweep a pipeline runs before
  * publishing a snapshot: primary-key uniqueness, foreign-key
  * orphans, null rates, and domain checks, each reported as one
  * (constraint, n_checked, n_violations) row. Every check is a
  * scan + aggregate or a co-partitioned anti join; the audit's output
  * is ≤ #constraints rows at any table size, and constraints on the
  * same table fuse into shared scans by Catalyst. */
object DataQuality {

  def audit(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(s, dir, "orders")
    val customer = Tables.load(s, dir, "customer")
    val lineitem = Tables.load(s, dir, "lineitem")

    def row(name: String, checked: DataFrame, violations: DataFrame): DataFrame =
      checked.agg(count(lit(1)).as("n_checked"))
        .crossJoin(violations.agg(count(lit(1)).as("n_violations")))
        .select(lit(name).as("constraint"), col("n_checked"), col("n_violations"))

    val pkOrders = row("orders.o_orderkey unique", orders,
      orders.groupBy(col("o_orderkey")).agg(count(lit(1)).as("c"))
        .filter(col("c") > 1))
    val pkCustomer = row("customer.c_custkey unique", customer,
      customer.groupBy(col("c_custkey")).agg(count(lit(1)).as("c"))
        .filter(col("c") > 1))
    val fkLine = row("lineitem.l_orderkey in orders", lineitem,
      lineitem.select(col("l_orderkey"))
        .join(orders.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_anti"))
    val fkOrders = row("orders.o_custkey in customer", orders,
      orders.select(col("o_custkey"))
        .join(customer.select(col("c_custkey")),
          col("o_custkey") === col("c_custkey"), "left_anti"))
    val nnPrice = row("lineitem.l_extendedprice not null", lineitem,
      lineitem.filter(col("l_extendedprice").isNull))
    val domDiscount = row("lineitem.l_discount in [0,1]", lineitem,
      lineitem.filter(col("l_discount") < 0 || col("l_discount") > 1))
    val domQty = row("lineitem.l_quantity > 0", lineitem,
      lineitem.filter(col("l_quantity") <= 0))

    Seq(pkOrders, pkCustomer, fkLine, fkOrders, nnPrice, domDiscount, domQty)
      .reduce(_ unionByName _)
      .orderBy(col("constraint"))
  }

  /** Merkle-style replica diff — the anti-entropy primitive (rsync /
    * Dynamo-family repair): two copies of a table are compared by
    * BUCKET DIGEST, not row-by-row — each side aggregates an
    * order-independent 60-bit digest (bit_xor of a portable per-row
    * md5-prefix hash) plus a row count per hash bucket, and only the
    * ≤ #buckets digest rows ever meet. Equal digests ⇒ skip the
    * bucket; differing digests name exactly which 1/`buckets` slice
    * needs a row-level repair pass — at 100 TB the first pass moves
    * KBs, and the expensive comparison runs only over the drifted
    * slices.
    *
    * The "replica" here is derived deterministically from the same
    * table (docs with doc_id % 97 == 0 get a corrupted text, one doc
    * in ~101 is dropped) so the oracle can reproduce it exactly. */
  def merkleDiff(docs: DataFrame, buckets: Int = 64): DataFrame = {
    def digestOf(side: DataFrame, suffix: String): DataFrame =
      side
        .select(pmod(col("doc_id"), lit(buckets.toLong)).as("bucket"),
          conv(substring(md5(concat(col("doc_id").cast("string"), lit(":"),
            col("text"))), 1, 15), 16, 10).cast("long").as("h"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as(s"n_$suffix"), expr("bit_xor(h)").as(s"dig_$suffix"))
    val a = digestOf(docs, "a")
    val b = digestOf(docs
      .filter(col("doc_id") % 101 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 97 === 0, concat(col("text"), lit(" corrupted")))
          .otherwise(col("text"))), "b")
    a.join(b, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        (coalesce(col("n_a"), lit(0L)) === coalesce(col("n_b"), lit(0L)) &&
          coalesce(col("dig_a"), lit(0L)) === coalesce(col("dig_b"), lit(0L)))
          .as("in_sync"))
      .orderBy(col("bucket"))
  }

  val declared: Seq[Declared] = Seq(
    Declared(
      "q165_merkle_diff",
      (s, dir) => merkleDiff(Tables.load(s, dir, "documents")),
      Some("""WITH b AS (
        |  SELECT doc_id % 101 <> 0 AS in_b,
        |         doc_id % 64 AS bucket,
        |         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
        |           CASE WHEN doc_id % 97 = 0 THEN text || ' corrupted'
        |                ELSE text END), 1, 15)) AS BIGINT) AS hb,
        |         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
        |           text), 1, 15)) AS BIGINT) AS ha
        |  FROM documents),
        |da AS (SELECT bucket, count(*) AS n_a, bit_xor(ha) AS dig_a
        |       FROM b GROUP BY 1),
        |db AS (SELECT bucket, count(*) AS n_b, bit_xor(hb) AS dig_b
        |       FROM b WHERE in_b GROUP BY 1)
        |SELECT coalesce(da.bucket, db.bucket) AS bucket,
        |  coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b,
        |  (coalesce(n_a, 0) = coalesce(n_b, 0)
        |   AND coalesce(dig_a, 0) = coalesce(dig_b, 0)) AS in_sync
        |FROM da FULL OUTER JOIN db ON da.bucket = db.bucket
        |ORDER BY bucket""".stripMargin),
      doc = "Merkle-style replica diff: order-independent per-bucket digests, only #buckets rows ever meet"),

    Declared(
      "q119_dq_audit",
      (s, dir) => audit(s, dir),
      Some("""SELECT * FROM (
        |  SELECT 'orders.o_orderkey unique' AS "constraint",
        |    (SELECT count(*) FROM orders) AS n_checked,
        |    (SELECT count(*) FROM (SELECT o_orderkey FROM orders
        |       GROUP BY 1 HAVING count(*) > 1)) AS n_violations
        |  UNION ALL
        |  SELECT 'customer.c_custkey unique',
        |    (SELECT count(*) FROM customer),
        |    (SELECT count(*) FROM (SELECT c_custkey FROM customer
        |       GROUP BY 1 HAVING count(*) > 1))
        |  UNION ALL
        |  SELECT 'lineitem.l_orderkey in orders',
        |    (SELECT count(*) FROM lineitem),
        |    (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |       (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |  UNION ALL
        |  SELECT 'orders.o_custkey in customer',
        |    (SELECT count(*) FROM orders),
        |    (SELECT count(*) FROM orders o WHERE NOT EXISTS
        |       (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        |  UNION ALL
        |  SELECT 'lineitem.l_extendedprice not null',
        |    (SELECT count(*) FROM lineitem),
        |    (SELECT count(*) FROM lineitem WHERE l_extendedprice IS NULL)
        |  UNION ALL
        |  SELECT 'lineitem.l_discount in [0,1]',
        |    (SELECT count(*) FROM lineitem),
        |    (SELECT count(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 1)
        |  UNION ALL
        |  SELECT 'lineitem.l_quantity > 0',
        |    (SELECT count(*) FROM lineitem),
        |    (SELECT count(*) FROM lineitem WHERE l_quantity <= 0)
        |) ORDER BY "constraint"""".stripMargin),
      doc = "Data-quality audit: PK/FK/null/domain constraints, one row each")
  )
}
