package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (round-15): decompose the shared router build (~3 s warm
  * in IdxProfile) — how much is the Lloyd's chain itself, the
  * Materialized parquet round-trip, and the seed assignment? */
object RouterProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val spark = SessionTuning.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Bench.silenceCheckpointWarns()
    spark.range(1000).selectExpr("sum(id)").collect()
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val stages = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size)
      }
    })
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val j0 = jobs.get(); val s0 = stages.get()
      val r = f
      println(f"[rprof] $name%-36s ${(System.nanoTime() - t0) / 1e9}%7.3f s" +
        f"  jobs=${jobs.get() - j0}%3d stages=${stages.get() - s0}%3d")
      r
    }
    (1 to 3).foreach { pass =>
      println(s"== pass $pass ==")
      Materialized.reset()
      val emb = Tables.load(spark, sfDir, "embeddings")
      val base = emb.filter(col("vec_id") % 4 =!= 3)
      t("corpus.count") { base.count() }
      val sampled = t("trainSample.ckpt+count") {
        val s = base.select(col("vec_id"), col("embedding"))
          .filter(pmod(conv(substring(
            md5(concat(lit("smp|"), col("vec_id").cast("string"))), 1, 15),
            16, 10).cast("long"), lit(8L)) === 0)
          .localCheckpoint()
        s.count(); s
      }
      val cent = t("kmeansPortable(chain only)") {
        val c = graft.similarity.Ann.kmeansCentroidsPortable(sampled, 8, 5)
        c.count(); c
      }
      t("cent.write+read (Materialized)") {
        Materialized.table(spark, sfDir, s"rprof-cent-$pass")(cent).count()
      }
      t("clusterSeeds") {
        graft.knn.GraphSearch.clusterSeeds(
          base.select(col("vec_id"), col("embedding")), cent, 4).count()
      }
      t("sharedRouterAndSeeds e2e (cold)") {
        val (c, cs) = graft.knn.GraphSearch.sharedRouterAndSeeds(
          spark, sfDir, "embBase4", 8, 5, 4, mod = 8)(base)
        c.count(); cs.count()
      }
      t("sharedRouterAndSeeds e2e (warm)") {
        val (c, cs) = graft.knn.GraphSearch.sharedRouterAndSeeds(
          spark, sfDir, "embBase4", 8, 5, 4, mod = 8)(base)
        c.count(); cs.count()
      }
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
