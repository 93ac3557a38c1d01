package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loaders for the driver-generated parquet testdata (TESTDATA.md).
  *
  * All tables are plain parquet; `spark.read.parquet` gives Catalyst
  * the columnar scan with predicate pushdown + column pruning for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** events.ts has shipped in two parquet flavors across testdata
    * generations: TIMESTAMP(NANOS) (unreadable natively by Spark 4 —
    * sessions set spark.sql.legacy.parquet.nanosAsLong and we rebuild a
    * microsecond timestamp, `div 1000` truncation — identical to
    * DuckDB's NANOS→TIMESTAMP read) and TIMESTAMP(MICROS) without UTC
    * adjustment, which Spark reads as TIMESTAMP_NTZ. Canonicalize both
    * to TIMESTAMP: sessions run with UTC session time zone, so the
    * NTZ→LTZ cast reinterprets the naive value as UTC — the same
    * instant DuckDB's naive read produces, and downstream epoch
    * arithmetic (`unix_micros` etc.) type-checks. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema.fieldNames.contains("ts")
        && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else if (name == "events" && df.schema.fieldNames.contains("ts")
        && df.schema("ts").dataType == TimestampNTZType)
      df.withColumn("ts", col("ts").cast("timestamp"))
    else df
  }
}
