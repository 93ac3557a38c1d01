package graft.relational

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RegressionSpec extends SparkSpec {
  import spark.implicits._

  /** Build an orders-shaped frame from (priority, epoch-day, dollars). */
  private def ordersOf(rows: Seq[(String, Int, Double)]) =
    rows.toDF("o_orderpriority", "d", "o_totalprice")
      .withColumn("o_orderdate",
        to_timestamp(date_add(lit("1970-01-01").cast("date"), col("d"))))
      .drop("d")

  test("exact line is recovered: slope, intercept, r2 = 1") {
    // y = 3x + 7 on integer points — moments are exact, closed form exact
    val df = ordersOf((0 to 10).map(x => ("A", x, 3.0 * x + 7)))
    val r = Regression.priceTrend(df).collect()(0)
    assert(r.getAs[Long]("n") == 11)
    assert(r.getAs[Double]("slope_dollars_per_day") == 3.0)
    assert(r.getAs[Double]("intercept_dollars") == 7.0)
    assert(r.getAs[Double]("r2") == 1.0)
  }

  test("flat series: slope 0, r2 NULL (zero y-variance, NULLIF guard)") {
    val df = ordersOf(Seq(("B", 1, 5.0), ("B", 2, 5.0), ("B", 3, 5.0)))
    val r = Regression.priceTrend(df).collect()(0)
    assert(r.getAs[Double]("slope_dollars_per_day") == 0.0)
    assert(r.getAs[Double]("intercept_dollars") == 5.0)
    assert(r.isNullAt(r.fieldIndex("r2")))
  }

  test("single point: zero x-variance yields NULL slope, not an ANSI error") {
    val df = ordersOf(Seq(("D", 4, 9.0)))
    val r = Regression.priceTrend(df).collect()(0)
    assert(r.isNullAt(r.fieldIndex("slope_dollars_per_day")))
    assert(r.isNullAt(r.fieldIndex("intercept_dollars")))
    assert(r.isNullAt(r.fieldIndex("r2")))
  }

  test("groups are independent and ordered") {
    val df = ordersOf(Seq(
      ("A", 0, 1.0), ("A", 1, 2.0),
      ("B", 0, 10.0), ("B", 1, 8.0)))
    val out = Regression.priceTrend(df).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("A", "B"))
    assert(out(0).getAs[Double]("slope_dollars_per_day") == 1.0)
    assert(out(1).getAs[Double]("slope_dollars_per_day") == -2.0)
  }

  test("shuffle-order invariance: moments are exact integers") {
    val rows = (0 until 200).map(x => ("C", x, (x * 37 % 91) + 0.75))
    val a = Regression.priceTrend(ordersOf(rows)).collect()(0)
    val b = Regression.priceTrend(ordersOf(scala.util.Random.shuffle(rows))
      .repartition(13)).collect()(0)
    assert(a.getAs[Double]("slope_dollars_per_day") ==
      b.getAs[Double]("slope_dollars_per_day"))
    assert(a.getAs[Double]("r2") == b.getAs[Double]("r2"))
  }
}
