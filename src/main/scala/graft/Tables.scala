package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated parquet testdata (TESTDATA.md).
  *
  * All tables are plain parquet; `spark.read.parquet` gives Catalyst
  * the columnar scan with predicate pushdown + column pruning for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 cannot read
    * natively; sessions set spark.sql.legacy.parquet.nanosAsLong and we
    * rebuild a microsecond timestamp here (`div 1000` truncation —
    * identical to DuckDB's NANOS→TIMESTAMP read of the same file). */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema.fieldNames.contains("ts")
        && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
