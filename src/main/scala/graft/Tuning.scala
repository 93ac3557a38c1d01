package graft

import org.apache.spark.sql.SparkSession

/** Session-conf scoping helpers for declared queries whose EAGER phase
  * (iterative loops, streaming replays) runs inside `run()`. */
object Tuning {

  /** Run `f` with `spark.sql.shuffle.partitions` set to `n`, restoring
    * the previous value after. Only meaningful for queries that execute
    * jobs inside the scope (e.g. an iterative build loop): a lazily
    * returned DataFrame plans its shuffles at action time, outside.
    *
    * Why it exists: an iterative algorithm at test scale runs dozens of
    * sub-MB shuffle rounds; at the harness's 32 partitions each round
    * pays 32 task setups for kilobytes of data, and AQE's post-shuffle
    * coalescing cannot help the many single-stage round-trip jobs a
    * driver-synced loop issues. A real deployment tunes exactly this
    * knob per stage (or lets AQE pick it at production data sizes); the
    * scoped value is the test-scale analogue, and the production-scale
    * path runs the same code under the cluster's own setting. */
  def withShufflePartitions[T](spark: SparkSession, n: Int)(f: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try f finally spark.conf.set(key, prev)
  }
}
