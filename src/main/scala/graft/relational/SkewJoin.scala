package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual escape hatch when a
  * hot key would overwhelm one reducer (AQE's skew-join split handles
  * sort-merge joins at runtime; salting also covers aggregations and
  * deterministic plans).
  *
  * The build side is replicated `salt` times; the probe side gets a
  * deterministic salt from xxhash64 over ALL of its columns (a pure
  * function of row content, stable across partition layouts) — so the
  * join result is exactly the unsalted join, but a hot key's rows
  * spread over `salt` reducers as long as they differ in any column.
  * Replication cost is `salt × |right|`, so use for dimension-sized
  * right sides or pre-filtered hot keys.
  */
object SkewJoin {

  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String,
                 rightKey: String, salt: Int): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(left.columns.toIndexedSeq.map(col): _*), lit(salt)))
    val saltedRight = right
      .withColumn("_salt", explode(sequence(lit(0), lit(salt - 1))))
      .withColumn("_salt", col("_salt").cast("long"))
    saltedLeft.join(saltedRight,
        saltedLeft(leftKey) === saltedRight(rightKey)
          && saltedLeft("_salt") === saltedRight("_salt"))
      .drop("_salt")
  }
}
