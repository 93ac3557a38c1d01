package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the latest right row with
  * `rightTs <= leftTs` within the same key (the time-series join Spark
  * lacks as a built-in operator).
  *
  * Composed from existing operators per the preference order (compose >
  * custom plan): tag both sides, union, and run one
  * `last(ignoreNulls)` window ordered by (ts, side) per key. One
  * shuffle on the key, no range cross-product, spill-safe — the same
  * shape at any scale. A range-condition join would explode pairs; a
  * custom SparkPlan buys nothing over this composition.
  */
object AsOfJoin {

  /** Left keeps all its columns and gains `asof_<c>` for each right
    * value column (null when no prior right row exists). Right should
    * be unique per (key, ts) for deterministic output — pre-aggregate
    * if not. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               valueCols: Seq[String]): DataFrame = {
    val lCols = left.columns.toSeq
    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
    val r = right.select(
      (col(key) +: col(rightTs).as("_ts") +:
        valueCols.map(c => col(c).as(s"_v_$c"))): _*)
      .withColumn("_side", lit(0))
    val both = l.unionByName(r, allowMissingColumns = true)
    // right rows sort before left rows at equal ts (side 0 < 1), so a
    // right row AT the left timestamp is visible to it ("<=" semantics)
    val w = Window.partitionBy(col(key))
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withAsof = valueCols.foldLeft(both) { (acc, c) =>
      acc.withColumn(s"asof_$c", last(col(s"_v_$c"), ignoreNulls = true).over(w))
    }
    withAsof
      .filter(col("_side") === 1)
      .select((lCols.map(col) ++ valueCols.map(c => col(s"asof_$c"))): _*)
  }
}
