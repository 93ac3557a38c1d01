package graft.relational

import graft.SparkSpec

class DataQualitySpec extends SparkSpec {

  test("audit: testdata is clean — 7 constraints, zero violations, full counts") {
    val out = DataQuality.audit(spark, sf0001).collect()
    assert(out.length == 7)
    out.foreach { r =>
      assert(r.getLong(2) == 0L, s"${r.getString(0)} reported violations")
      assert(r.getLong(1) > 0L, s"${r.getString(0)} checked nothing")
    }
  }

  test("audit surfaces violations on a corrupted orders slice") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // duplicate one order key and orphan one custkey, write to a temp
    // dir mirroring the table layout, then audit that dir
    val dir = java.nio.file.Files.createTempDirectory("graft-dq").toString
    val orders = graft.Tables.load(spark, sf0001, "orders")
    orders.unionByName(orders.limit(1))                       // dup PK
      .unionByName(orders.limit(1).withColumn("o_custkey", lit(999999L)))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    graft.Tables.load(spark, sf0001, "customer")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    graft.Tables.load(spark, sf0001, "lineitem")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = DataQuality.audit(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got("orders.o_orderkey unique") >= 1L)
    assert(got("orders.o_custkey in customer") == 1L)
    assert(got("lineitem.l_quantity > 0") == 0L)
  }
}
