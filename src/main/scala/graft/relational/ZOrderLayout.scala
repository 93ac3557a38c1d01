package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.{Declared, Tables}

/** Z-order (Morton) clustering — the multi-dimensional data-layout
  * primitive: interleaving the bits of two dimension keys gives ONE
  * sort key whose contiguous ranges are small rectangles in (x, y)
  * space, so parquet min/max stats on the single z column prune scans
  * filtered on EITHER dimension. This is how a 100 TB table laid out
  * with `layoutByZOrder` serves both `WHERE user_bucket = …` and
  * `WHERE hour_bucket = …` queries from a fraction of its files —
  * a linear sort-by-one-column cannot.
  *
  * The interleave is pure integer bit arithmetic built from codegen'd
  * built-ins (shifts/and/sum) — no UDF, stays inside whole-stage
  * codegen, and the DuckDB oracle evaluates the identical expression.
  */
object ZOrderLayout {

  /** Morton key: interleave the low `bits` bits of x (even positions)
    * and y (odd positions). Total key width = 2·bits ≤ 62. */
  def zkey(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** The identical arithmetic as DuckDB SQL (mirrors [[zkey]]). */
  def zkeySql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  /** Cluster a table for multi-dim pruning: range-partition on the
    * z-key (so file boundaries are z-ranges), sort within partitions
    * (so row groups are z-runs). Write the result with any sink and
    * both dimensions prune on parquet min/max stats. */
  def layoutByZOrder(df: DataFrame, z: Column, partitions: Int): DataFrame =
    df.withColumn("zkey", z)
      .repartitionByRange(partitions, col("zkey"))
      .sortWithinPartitions(col("zkey"))

  /** Declared surface: 64×64 grid over events (user bucket × hour
    * bucket), keyed by the 12-bit Morton code, aggregated per 8×8 tile
    * (zkey >> 6). Each tile's min/max PROVE the locality property the
    * layout exists for: a contiguous 64-key z-range bounds BOTH x and
    * y within 8 — the rectangle a file's min/max stats would prune by. */
  def tileProfile(events: DataFrame): DataFrame = {
    val x = pmod(col("user_id"), lit(64L))
    val y = pmod(expr("unix_micros(ts) div 3600000000"), lit(64L))
    events
      .select(x.as("x"), y.as("y"))
      .withColumn("zkey", zkey(col("x"), col("y"), 6))
      .withColumn("tile", shiftright(col("zkey"), 6))
      .groupBy(col("tile"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"),
        min(col("zkey")).as("min_z"), max(col("zkey")).as("max_z"))
      .orderBy(col("tile"))
  }

  val declared: Seq[Declared] = Seq(
    Declared(
      "q104_zorder_tiles",
      (s, dir) => tileProfile(Tables.load(s, dir, "events")),
      Some {
        val z = zkeySql("x", "y", 6)
        s"""WITH g AS (SELECT user_id % 64 AS x,
           |        (epoch_us(ts) // 3600000000) % 64 AS y
           |      FROM events),
           |k AS (SELECT x, y, $z AS zkey FROM g)
           |SELECT zkey >> 6 AS tile, count(*) AS n,
           |  min(x) AS min_x, max(x) AS max_x,
           |  min(y) AS min_y, max(y) AS max_y,
           |  min(zkey) AS min_z, max(zkey) AS max_z
           |FROM k GROUP BY 1 ORDER BY tile""".stripMargin
      },
      doc = "Z-order (Morton) tile profile: one sort key bounds both dims for pruning")
  )
}
