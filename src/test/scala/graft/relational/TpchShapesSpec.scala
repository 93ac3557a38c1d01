package graft.relational

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-crafted semantic cases for the TPC-H shapes whose correctness
  * hinges on a row an approximate rendering would miss: Q13's
  * zero-order customers (outer join), Q15's max ties, and Q5's cyclic
  * same-nation condition. */
class TpchShapesSpec extends SparkSpec {
  import spark.implicits._

  test("Q13: zero-order customers appear as c_count = 0") {
    val customer = Seq(1L, 2L, 3L).toDF("c_custkey")
    val orders = Seq(1L, 1L, 2L).toDF("o_custkey")
    val rows = TpchShapes.customerDistribution(customer, orders)
      .as[(Long, Long)].collect().toMap
    // cust 1 has 2 orders, cust 2 has 1, cust 3 has 0
    assert(rows == Map(2L -> 1L, 1L -> 1L, 0L -> 1L))
  }

  test("Q15: all suppliers tied at the max revenue are returned") {
    val li = Seq(
      (10L, "1996-02-01", 100.0, 0.0),
      (20L, "1996-02-02", 60.0, 0.0),
      (20L, "1996-02-03", 40.0, 0.0),
      (30L, "1996-02-04", 99.0, 0.0),
      (10L, "1995-01-01", 999.0, 0.0) // outside the quarter
    ).toDF("l_suppkey", "d", "l_extendedprice", "l_discount")
      .withColumn("l_shipdate", col("d").cast("timestamp")).drop("d")
    val supp = Seq((10L, "S10"), (20L, "S20"), (30L, "S30"))
      .toDF("s_suppkey", "s_name")
    val out = TpchShapes.topSupplier(li, supp)
      .select("s_suppkey").as[Long].collect().toSeq
    assert(out == Seq(10L, 20L)) // both at 100.00, S30 at 99.00 excluded
  }

  test("Q5: only same-nation customer/supplier pairs contribute") {
    val customer = Seq((1L, 0), (2L, 1)).toDF("c_custkey", "c_nationkey")
    val orders = Seq((100L, 1L, "1996-05-01"), (200L, 2L, "1996-05-01"))
      .toDF("o_orderkey", "o_custkey", "d")
      .withColumn("o_orderdate", col("d").cast("timestamp")).drop("d")
    val lineitem = Seq(
      (100L, 7L, 50.0, 0.0), // supp 7 is nation 0 = cust 1's nation -> counts
      (200L, 8L, 70.0, 0.0)  // supp 8 is nation 0 != cust 2's nation 1 -> dropped
    ).toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val supplier = Seq((7L, 0), (8L, 0)).toDF("s_suppkey", "s_nationkey")
    val nation = Seq((0, "NATION_0", 2), (1, "NATION_1", 2))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val region = Seq((2, "ASIA")).toDF("r_regionkey", "r_name")
    val out = TpchShapes.localSupplierVolume(
      customer, orders, lineitem, supplier, nation, region)
      .as[(String, Double)].collect().toSeq
    assert(out == Seq(("NATION_0", 50.0)))
  }

  test("Q14: promo share divides exact cent sums; month filter applies") {
    val li = Seq(
      (1L, "1996-03-05", 30.0, 0.0),  // promo part, in month
      (2L, "1996-03-07", 90.0, 0.0),  // non-promo, in month
      (1L, "1996-04-01", 500.0, 0.0)  // promo but outside the month
    ).toDF("l_partkey", "d", "l_extendedprice", "l_discount")
      .withColumn("l_shipdate", col("d").cast("timestamp")).drop("d")
    val part = Seq((1L, "PROMO"), (2L, "STANDARD")).toDF("p_partkey", "p_type")
    val out = TpchShapes.promoRevenue(li, part)
      .as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((3000L, 12000L, 25.0)))
  }
}
