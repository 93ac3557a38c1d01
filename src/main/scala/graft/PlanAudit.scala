package graft

import org.apache.spark.sql.SparkSession

/** One-shot audit: flags declared queries whose physical plans contain
  * single-partition funnels that would serialize at scale — a Window
  * with no partition spec, or an Exchange SinglePartition feeding
  * anything other than a final scalar/limit. Advisory output; the
  * per-query plan gates live in PlanSpecs. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Registry.all.foreach { d =>
      try {
        val qe = d.run(spark, sfDir).queryExecution
        val plan = qe.executedPlan.toString
        // String-matching "windowspecdefinition()" never fires (plan
        // strings always carry the frame argument); inspect the
        // optimized plan's Window nodes instead. foldable covers both
        // an empty spec and a constant partition column that Catalyst
        // will fold away — either funnels all rows into one task.
        val globalWindow = qe.optimizedPlan.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.forall(_.foldable) => w
        }.nonEmpty
        val single = plan.linesIterator.count(_.contains("SinglePartition"))
        if (globalWindow || single > 0)
          println(s"[audit] ${d.name}: globalWindow=$globalWindow singlePartitionExchanges=$single")
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      } catch { case e: Throwable =>
        println(s"[audit] ${d.name}: ERROR ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
