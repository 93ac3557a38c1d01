package graft.relational

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class RuntimeFilterSpec extends SparkSpec {

  test("bloom-prefiltered join is result-identical to the plain join") {
    val lineitem = Tables.load(spark, sf0001, "lineitem")
    val supplier = Tables.load(spark, sf0001, "supplier")
    val got = RuntimeFilter
      .lowNationSupplierRevenue(lineitem, supplier)
      .collect().map(_.toString).toSeq
    val dim = supplier.filter(col("s_nationkey") < 5)
      .select(col("s_suppkey"), col("s_name"))
    val plain = lineitem.join(dim, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(count(lit(1)).as("n_items"),
        sum((round(col("l_extendedprice") * 100).cast("long") * (lit(100L) -
          round(col("l_discount") * 100).cast("long")))).as("revenue_c4"))
      .orderBy(col("s_suppkey"))
      .collect().map(_.toString).toSeq
    assert(got == plain)
  }

  test("the prefilter actually prunes fact rows before the join") {
    val lineitem = Tables.load(spark, sf0001, "lineitem")
    val supplier = Tables.load(spark, sf0001, "supplier")
    val dim = supplier.filter(col("s_nationkey") < 5).select(col("s_suppkey"))
    val bf = dim.stat.bloomFilter("s_suppkey", 100000L, 0.01)
    val mightContain = org.apache.spark.sql.graft.SketchExpressions
      .mightContainLong(bf, col("l_suppkey"))
    val total = lineitem.count()
    val kept = lineitem.filter(mightContain).count()
    val trueMatches = lineitem
      .join(dim, col("l_suppkey") === col("s_suppkey"), "left_semi").count()
    // no false negatives; false positives bounded well under the pruned mass
    assert(kept >= trueMatches)
    assert(kept < total, "prefilter pruned nothing")
    assert(kept - trueMatches <= (total * 0.05).toLong,
      s"fp overhead too high: kept=$kept true=$trueMatches total=$total")
  }

  test("the probe is the native might_contain predicate, not a UDF") {
    val lineitem = Tables.load(spark, sf0001, "lineitem")
    val supplier = Tables.load(spark, sf0001, "supplier")
    val plan = RuntimeFilter.lowNationSupplierRevenue(lineitem, supplier)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"native bloom probe missing:\n$plan")
    assert(!plan.contains("UDF"), s"UDF survived in the declared plan:\n$plan")
  }
}
