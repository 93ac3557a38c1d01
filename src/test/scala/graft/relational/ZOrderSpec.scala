package graft.relational

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {

  test("zkey is a bijection on the 64x64 grid and tiles bound both dims") {
    import spark.implicits._
    val grid = (0L until 64L).flatMap(x => (0L until 64L).map(y => (x, y)))
      .toDF("x", "y")
      .withColumn("zkey", ZOrderLayout.zkey(col("x"), col("y"), 6))
    // bijection: 4096 distinct keys in [0, 4096)
    val keys = grid.select(col("zkey")).distinct()
    assert(keys.count() == 4096)
    val mm = grid.agg(min(col("zkey")), max(col("zkey"))).head()
    assert(mm.getLong(0) == 0L && mm.getLong(1) == 4095L)
    // locality: every 64-key tile is an exact 8x8 rectangle — the
    // pruning guarantee a z-range gives a file's min/max stats
    val tiles = grid.withColumn("tile", shiftright(col("zkey"), 6))
      .groupBy(col("tile"))
      .agg(min(col("x")).as("mnx"), max(col("x")).as("mxx"),
        min(col("y")).as("mny"), max(col("y")).as("mxy"),
        count(lit(1)).as("n"))
      .collect()
    assert(tiles.length == 64)
    tiles.foreach { t =>
      assert(t.getAs[Long]("n") == 64L)
      assert(t.getAs[Long]("mxx") - t.getAs[Long]("mnx") == 7L)
      assert(t.getAs[Long]("mxy") - t.getAs[Long]("mny") == 7L)
    }
  }

  test("layoutByZOrder clusters partitions into disjoint z-ranges") {
    import spark.implicits._
    val pts = (0L until 32L).flatMap(x => (0L until 32L).map(y => (x, y)))
      .toDF("x", "y")
    val laid = ZOrderLayout.layoutByZOrder(
      pts, ZOrderLayout.zkey(col("x"), col("y"), 5), 8)
    // per-partition [min, max] z-ranges must not overlap — that is
    // exactly the property that lets file-level stats prune
    val ranges = laid
      .select(spark_partition_id().as("p"), col("zkey"))
      .groupBy(col("p"))
      .agg(min(col("zkey")).as("lo"), max(col("zkey")).as("hi"))
      .orderBy(col("lo"))
      .collect()
    val sorted = ranges.map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
    sorted.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2)
      case _ =>
    }
  }
}
