package graft.relational

import java.sql.Timestamp

import graft.SparkSpec

class JoinShapesSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s + " 00:00:00")

  test("waitingSuppliers: sole-late-in-multi-supplier-order semantics") {
    import spark.implicits._
    val orders = Seq(
      (1L, ts("2024-01-01")), (2L, ts("2024-01-01")), (3L, ts("2024-01-01")))
      .toDF("o_orderkey", "o_orderdate")
    val lineitem = Seq(
      // order 1: supplier 10 late, supplier 20 on time → 10 qualifies
      (1L, 10L, ts("2024-05-01")),
      (1L, 20L, ts("2024-01-15")),
      // order 2: suppliers 10 AND 30 both late → neither qualifies
      (2L, 10L, ts("2024-05-01")),
      (2L, 30L, ts("2024-05-01")),
      // order 3: supplier 10 late but sole supplier → not counted
      (3L, 10L, ts("2024-05-01")))
      .toDF("l_orderkey", "l_suppkey", "l_shipdate")
    val supplier = Seq((10L, "S10"), (20L, "S20"), (30L, "S30"))
      .toDF("s_suppkey", "s_name")

    val out = JoinShapes.waitingSuppliers(lineitem, orders, supplier).collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 10L && out.head.getLong(2) == 1L)
  }

  test("smallQuantityRevenue: strictly-under-20%-of-part-average lines (Q17 shape)") {
    import spark.implicits._
    // part 1: quantities 1, 10, 10, 10, 19 → avg 10; only qty 1 is
    // < 2.0; qty 19 and the 10s are not. part 2: single line can never
    // be below its own average.
    val li = Seq(
      (1L, 1.0, 100.0), (1L, 10.0, 100.0), (1L, 10.0, 100.0),
      (1L, 10.0, 100.0), (1L, 19.0, 100.0),
      (2L, 5.0, 100.0))
      .toDF("l_partkey", "l_quantity", "l_extendedprice")
    val part = Seq((1L, "B1"), (2L, "B2")).toDF("p_partkey", "p_brand")
    val out = JoinShapes.smallQuantityRevenue(li, part).collect()
    assert(out.length == 1)
    assert(out.head.getString(0) == "B1" && out.head.getLong(1) == 1L
      && out.head.getDouble(2) == 100.0)
  }

  test("brandRevenue: only rows satisfying a full disjunct survive (Q19 shape)") {
    import spark.implicits._
    val part = Seq(
      (1L, "Brand#12", 10), // size in [1,15]
      (2L, "Brand#23", 30), // size OUT of [1,25]
      (3L, "Brand#3", 30))  // size in [1,35]
      .toDF("p_partkey", "p_brand", "p_size")
    val li = Seq(
      (1L, 5.0, 100.0, 0.0),   // qty in [1,11]  → matches disjunct 1
      (1L, 15.0, 100.0, 0.0),  // qty out        → no
      (2L, 15.0, 100.0, 0.0),  // size fails     → no
      (3L, 25.0, 200.0, 0.5))  // qty in [20,30] → matches disjunct 3
      .toDF("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val out = JoinShapes.brandRevenue(li, part)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out == Set(("Brand#12", 1L, 100.0), ("Brand#3", 1L, 100.0)))
  }

  test("bandedRangeJoin == direct band join incl. exact boundaries (sf0.001)") {
    import graft.Tables
    import org.apache.spark.sql.functions._
    val cust = Tables.load(spark, sf0001, "customer")
    val supp = Tables.load(spark, sf0001, "supplier")
    val got = JoinShapes.bandedRangeJoin(cust, supp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val cents = (c: String) => round(col(c) * 100).cast("long")
    val want = supp.select(col("s_suppkey"), cents("s_acctbal").as("sc"))
      .join(cust.select(cents("c_acctbal").as("cc")),
        col("cc") >= col("sc") - 10000L && col("cc") <= col("sc") + 10000L)
      .groupBy(col("s_suppkey"))
      .agg(count(lit(1)).as("n"), (sum(col("cc")).cast("double") / 100.0).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("bandedRangeJoin: boundary values exactly band apart are included") {
    import spark.implicits._
    // 100.00 vs 200.00 → exactly band (10000 cents) apart → included;
    // 100.00 vs 200.01 → excluded. Bucket edges: 199.99/200.00 straddle.
    val cust = Seq(100.00, 200.00, 200.01, 299.99, 300.01)
      .toDF("c_acctbal")
    val supp = Seq((1L, 200.00)).toDF("s_suppkey", "s_acctbal")
    val out = JoinShapes.bandedRangeJoin(cust, supp).collect()
    assert(out.length == 1)
    // matches: 100.00, 200.00, 200.01, 299.99 (300.01 is out)
    assert(out.head.getLong(1) == 4L)
  }

  test("untappedCustomers: above-average balance AND no orders (Q22 shape)") {
    import spark.implicits._
    // positive balances: 100, 300 → avg 200; customer 2 (300) is above
    // it but has an order; customer 4 (500, nation 7) qualifies;
    // customer 3's negative balance is excluded from the average but
    // also below it; customer 1 (100) is below average.
    val customer = Seq(
      (1L, 5, 100.0), (2L, 5, 300.0), (3L, 7, -50.0), (4L, 7, 500.0))
      .toDF("c_custkey", "c_nationkey", "c_acctbal")
    val orders = Seq((100L, 2L)).toDF("o_orderkey", "o_custkey")
    val out = JoinShapes.untappedCustomers(
      customer, orders.select($"o_custkey")).collect()
    assert(out.length == 1)
    assert(out.head.getInt(0) == 7 && out.head.getLong(1) == 1L
      && out.head.getDouble(2) == 500.0)
  }

  test("hourlyDivision: only types covering every observed hour qualify") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // observed hours overall: {0, 1, 2}. "full" covers all three;
    // "partial" misses hour 2; "single" has one hour only.
    val rows = Seq(
      ("full", 0), ("full", 1), ("full", 2), ("full", 0),
      ("partial", 0), ("partial", 1),
      ("single", 2))
    val events = rows.zipWithIndex
      .map { case ((t, h), i) => (i.toLong, t, f"2024-01-01 $h%02d:30:00") }
      .toDF("event_id", "event_type", "tss")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val out = JoinShapes.hourlyDivision(events).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("full", 3L)))
  }

  test("hourlyDivision equals the double-NOT-EXISTS form") {
    import org.apache.spark.sql.functions._
    val events = graft.Tables.load(spark, sf0001, "events")
    val hrs = events.select(col("event_type"), hour(col("ts")).as("h")).distinct()
    val allH = hrs.select(col("h")).distinct()
    // textbook division: types with NO uncovered hour
    val uncovered = hrs.select(col("event_type")).distinct().crossJoin(allH)
      .except(hrs)
    val expected = hrs.select(col("event_type")).distinct()
      .join(uncovered.select(col("event_type")).distinct(), Seq("event_type"), "left_anti")
      .collect().map(_.getString(0)).toSet
    val got = JoinShapes.hourlyDivision(events).collect().map(_.getString(0)).toSet
    assert(got == expected)
  }
}
