package graft.knn

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale measurement for the PERSISTED graph-index lifecycle through
  * the DEFAULT build path (round-13 verdict #2): unlike
  * [[GraphSearchScale]] — which measures in-flight serving arms with
  * the fast JVM quantizer — this drives [[GraphIndexStore.write]]
  * itself, so the number of record covers what the declared q225 path
  * actually does at scale: the md5-sampled portable Lloyd's (the
  * auto `max(1, n/65536)` rule), the full-corpus seed assignment, the
  * parquet write, and the served recall through
  * [[GraphIndexStore.search]] reading ONLY the index dir.
  *
  * The round-13 finding this re-measures: full-corpus portable Lloyd's
  * at 1M cost 3010 s (6.8× the 441.6 s MRDF graph build); the sampled
  * default must bring the router phase under ~400 s at recall ≥ 0.98.
  *
  * Usage: `runMain graft.knn.GraphIndexScale [n] [trainSampleMod]
  * [nlist] [iters] [seedsPerList] [beam] [hops] [nprobe]`
  * (trainSampleMod 0 = the auto default). Results are hand-recorded in
  * SCALING.json (`round14_graph_serving_1m`). */
object GraphIndexScale {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val trainSampleMod = if (args.length > 1) args(1).toInt else 0
    val nlist = if (args.length > 2) args(2).toInt else 1024
    val iters = if (args.length > 3) args(3).toInt else 3
    val seedsPerList = if (args.length > 4) args(4).toInt else 8
    val beam = if (args.length > 5) args(5).toInt else 8
    val hops = if (args.length > 6) args(6).toInt else 4
    val nprobe = if (args.length > 7) args(7).toInt else 2
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("GraphIndexScale")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val path = s"/root/repo/target/scaling/mix${n / 1000}k_seed42.fvecs"
    val f = new java.io.File(path)
    if (!f.exists() || f.length() != n * (4L + 4L * 64)) {
      Option(f.getParentFile).foreach(_.mkdirs())
      graft.io.FvecsGen.write(path, n, 64, 42L, 1000)
    }
    val vecs = graft.io.Fvecs.readAuto(spark, path)
      .toDF("vec_id", "embedding").localCheckpoint()
    val t0 = System.nanoTime()
    val edges = graft.mrdf.Mrdf.buildGraph(vecs,
      graft.mrdf.Mrdf.Params(alpha = 12000))
    val nEdges = edges.count()
    val buildSec = (System.nanoTime() - t0) / 1e9
    println(f"[graph-index-scale] n=$n graph build: edges=$nEdges " +
      f"buildSec=$buildSec%.1f")

    val dir = java.nio.file.Files
      .createTempDirectory("graft-gidx-scale-").toString
    val phases = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val t1 = System.nanoTime()
    GraphIndexStore.write(vecs, edges, dir, k = 10, nlist = nlist,
      kmeansIters = iters, seedsPerList = seedsPerList,
      trainSampleMod = trainSampleMod,
      onPhase = (p, s) => { phases(p) = s; () })
    val writeSec = (System.nanoTime() - t1) / 1e9
    graft.Checkpoints.release(edges)
    val meta = spark.read.parquet(s"$dir/meta").collect()(0)
    println(f"[graph-index-scale] write: totalSec=$writeSec%.1f " +
      phases.map { case (p, s) => f"$p=$s%.1f" }.mkString(" ") +
      s" manifest(mod=${meta.getAs[Int]("train_sample_mod")}, " +
      s"train_n=${meta.getAs[Long]("train_n")})")

    val step = math.max(1L, n / 256L)
    val queries = vecs.filter(col("vec_id") % step === 0).localCheckpoint()
    val nQ = queries.count()
    // untimed warmup pays the serve plan's codegen
    GraphIndexStore.search(spark, dir, queries, k = 10, beam = beam,
      hops = hops, nprobe = nprobe).count()
    val t2 = System.nanoTime()
    val got = GraphIndexStore.search(spark, dir, queries, k = 10,
        beam = beam, hops = hops, nprobe = nprobe)
      .select(col("qid"), col("nbr")).collect()
    val serveSec = (System.nanoTime() - t2) / 1e9
    val gotSet = got.map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = org.apache.spark.sql.graft.TopKJoin.knn(queries, vecs, 10)
      .select(col("id"), col("nbr")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val recall = truth.count(gotSet.contains).toDouble / truth.length
    println(f"[graph-index-scale] serve: queries=$nQ nlist=$nlist " +
      f"nprobe=$nprobe seedsPerList=$seedsPerList beam=$beam hops=$hops " +
      f"serveSec=$serveSec%.1f recall@10=$recall%.4f")
    GraphIndexStore.deleteIndexDir(dir)
    spark.stop()
  }
}
