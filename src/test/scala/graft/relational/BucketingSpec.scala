package graft.relational

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Bucketed-table co-located join — the shuffle-elimination technique
  * for repeated large-table joins (SURVEY §4 / 100 TB design): both
  * sides bucketed on the join key ⇒ the join plan contains no Exchange
  * on the bucketed sides. */
class BucketingSpec extends SparkSpec {

  test("bucketed join runs without a shuffle exchange") {
    val li = Tables.load(spark, sf0001, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val o = Tables.load(spark, sf0001, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_b")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_b")
    val joined = spark.table("li_b")
      .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    // result equivalence with the plain join
    assert(joined.count() ==
      li.join(o, col("l_orderkey") === col("o_orderkey")).count())
    spark.sql("DROP TABLE li_b")
    spark.sql("DROP TABLE o_b")
  }
}
