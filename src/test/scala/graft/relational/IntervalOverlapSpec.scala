package graft.relational

import org.apache.spark.sql.functions._
import graft.SparkSpec

class IntervalOverlapSpec extends SparkSpec {
  import spark.implicits._

  /** orders-shaped frame from (okey, custkey, prio, epoch-day). */
  private def ordersOf(rows: Seq[(Long, Long, String, Int)]) =
    rows.toDF("o_orderkey", "o_custkey", "o_orderpriority", "d")
      .withColumn("o_orderdate",
        to_timestamp(date_add(lit("1970-01-01").cast("date"), col("d"))))
      .drop("d")

  private def custOf(rows: Seq[(Long, Int)]) =
    rows.toDF("c_custkey", "c_nationkey")

  private val oneCust = custOf(Seq((1L, 7)))

  test("boundary overlaps: touching endpoints count, disjoint do not") {
    // urgent [10,13]; low [13,16] touches (1 shared day), [14,17] disjoint
    val out = JoinShapes.intervalOverlapJoin(ordersOf(Seq(
      (1L, 1L, "1-URGENT", 10),
      (2L, 1L, "5-LOW", 13),
      (3L, 1L, "5-LOW", 14))), oneCust).collect()
    assert(out.length == 1)
    assert(out(0).getLong(0) == 1L)
    assert(out(0).getLong(2) == 1L)  // one overlapping partner
    assert(out(0).getLong(3) == 1L)  // exactly the shared day 13
  }

  test("pairs meeting in two shared buckets emit exactly once") {
    // both intervals straddle the same week boundary (days 12..15 with
    // width 7 → buckets 1 and 2): the emit-once rule must not double count
    val out = JoinShapes.intervalOverlapJoin(ordersOf(Seq(
      (1L, 1L, "1-URGENT", 12),
      (2L, 1L, "5-LOW", 12))), oneCust).collect()
    assert(out.length == 1 && out(0).getLong(2) == 1L && out(0).getLong(3) == 4L)
  }

  test("different nations never pair") {
    val out = JoinShapes.intervalOverlapJoin(ordersOf(Seq(
      (1L, 1L, "1-URGENT", 10),
      (2L, 2L, "5-LOW", 10))),
      custOf(Seq((1L, 7), (2L, 8)))).collect()
    assert(out.isEmpty)
  }

  test("banded result equals the brute-force non-equi join") {
    // 60 urgent + 60 low intervals over 200 days, 3 nations
    val rows = (0 until 120).map { i =>
      val prio = if (i % 2 == 0) "1-URGENT" else "5-LOW"
      (i.toLong, (i % 3).toLong + 1, prio, (i * 37) % 200)
    }
    val cust = custOf(Seq((1L, 1), (2L, 2), (3L, 3)))
    val o = ordersOf(rows)
    val got = JoinShapes.intervalOverlapJoin(o, cust)
    val iv = o.join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("c_nationkey").as("nation"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast("date")).as("s"))
      .withColumn("e", col("s") + 3)
    val l = iv.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("nation"), col("o_orderkey").as("o1"), col("s").as("s1"), col("e").as("e1"))
    val r = iv.filter(col("o_orderpriority") === "5-LOW")
      .select(col("nation").as("n2"), col("o_orderkey").as("o2"), col("s").as("s2"), col("e").as("e2"))
    val want = l.join(r, col("nation") === col("n2")
        && col("s1") <= col("e2") && col("s2") <= col("e1"))
      .groupBy(col("o1"), col("nation"))
      .agg(count(lit(1)).as("n_overlaps"),
        sum(least(col("e1"), col("e2")) - greatest(col("s1"), col("s2")) + 1)
          .as("total_overlap_days"))
      .orderBy(col("o1"))
    assert(got.collect().toSeq == want.collect().toSeq)
  }
}
