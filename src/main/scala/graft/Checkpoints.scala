package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Release helper for `localCheckpoint`ed DataFrames.
  *
  * `Dataset.unpersist` only covers CacheManager entries; a
  * `localCheckpoint` pins its materialized RDD blocks in executor
  * memory directly, for the life of the session, unless the underlying
  * RDD is unpersisted. Iterative algorithms (MRDF divide/merge, k-means)
  * checkpoint per round to truncate lineage — without an explicit
  * release every superseded round's blocks stay pinned and tax every
  * later query in the same session (measured 7–26× inflation in the
  * round-1 shared-session bench).
  */
object Checkpoints {

  /** Unpersist the checkpointed RDDs at the leaves of `df`'s plan.
    * No-op for plans without `LogicalRDD` leaves (e.g. the initial
    * empty graph or an un-checkpointed first iteration). Safe to call
    * only once the successor checkpoint has eagerly materialized. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
