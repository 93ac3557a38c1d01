package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's scalability harness (`testdatascalability.py:29-43`:
  * time MRDF per vector count, print (count, seconds) pairs) — without
  * its crash on the undefined `aargs.outputfile` at the end.
  *
  * Usage: `runMain graft.Scalability [source] [count1,count2,...] [default]`
  *
  * `source` is either a testdata sf dir (embeddings.parquet) or a
  * `.fvecs` file (e.g. from `graft.io.FvecsGen`) read through the
  * distributed fvecs source — the path for the 10×–100× scaling runs
  * beyond the largest testdata SF.
  *
  * With the third arg `default`, MRDF runs at the reference's default
  * parameters (k=30, ρ=15, α=150000 — the 100 TB regime) and each run
  * also reports recall vs exact truth. Up to 4000 vectors the truth is
  * the full brute-force graph; above that it is SAMPLED truth — 256
  * evenly-spaced query ids whose exact top-k against the full set
  * comes from the fused TopKJoin (N·256 distance evals, not N²), the
  * standard recall protocol at scales where the full ground truth
  * itself is the intractable object. */
object Scalability {
  def main(args: Array[String]): Unit = {
    val src = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val counts = (if (args.length > 1) args(1) else "500,1000,2000")
      .split(",").map(_.trim.toInt).toSeq
    // Third arg: "default" = paper parameters (k=30, ρ=15, α=150000);
    // "default:alpha=N" = paper k/ρ with block-size cap N. The paper α
    // targets executor memory on a real cluster; on one machine it
    // leaves every N < α in a single serial NN-Descent block, so the
    // local scaling sweep caps α near N/cores to exercise the actual
    // divide-and-parallelize path the cluster would run.
    // ":driverBytes=N" caps the divide's per-level driver sample payload
    // — small values force the DISTRIBUTED-centroid arm (Mrdf.divide's
    // smallLevel=false branch) at Ns where the driver arm would
    // normally run, so the cluster-extreme code path gets measured
    // large-N walls/recalls, not only spec coverage (round-10 verdict
    // #4). Level-0 levels stay broadcast-joined under the same cap via
    // the accurate per-level estimate.
    val mode = if (args.length > 2) args(2) else ""
    val useDefaults = mode.startsWith("default")
    val params = {
      val base = if (useDefaults) mrdf.Mrdf.Params() else mrdf.MrdfQueries.testParams
      val withAlpha = "alpha=(\\d+)".r.findFirstMatchIn(mode)
        .map(m => base.copy(alpha = m.group(1).toInt))
        .getOrElse(base)
      "driverBytes=(\\d+)".r.findFirstMatchIn(mode)
        .map(m => withAlpha.copy(driverSampleBytes = m.group(1).toLong))
        .getOrElse(withAlpha)
    }
    if (params.driverSampleBytes != mrdf.Mrdf.Params().driverSampleBytes)
      println(s"[scalability] driverSampleBytes=${params.driverSampleBytes} " +
        "(forcing the distributed-centroid divide arm)")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("MRDFScalability")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val all =
      if (src.endsWith(".fvecs"))
        io.Fvecs.readAuto(spark, src).toDF("vec_id", "embedding")
      else Tables.load(spark, src, "embeddings")
    val results = counts.map { n =>
      // fvecs ids are ordinal, so a pushed-down filter selects the
      // prefix without a global sort; the parquet path keeps the
      // original orderBy+limit (id space there is also ordinal but
      // small enough that the sort is free)
      val vecs =
        if (src.endsWith(".fvecs")) all.filter(col("vec_id") < n)
        else all.orderBy(col("vec_id")).limit(n)
      val t0 = System.nanoTime()
      val edges = mrdf.Mrdf.buildGraph(vecs, params)
      val nEdges = edges.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val recall =
        if (useDefaults) f"  recall=${recallVsTruth(vecs, edges, params.k, n)}%.4f"
        else ""
      Checkpoints.release(edges)
      println(f"($n, $sec%.2f)  # edges=$nEdges$recall")
      (n, sec)
    }
    println(results.map { case (n, s) => f"($n, $s%.2f)" }.mkString("[", ", ", "]"))
    spark.stop()
  }

  /** Recall of `edges` vs exact truth: full brute force when feasible,
    * sampled queries (fused exact top-k per query) beyond. Shared with
    * the per-round scaled-recall gate in [[Bench]]. */
  private[graft] def recallVsTruth(vecs: DataFrame, edges: DataFrame,
      k: Int, n: Int): Double = {
    val truth =
      if (n <= 4000)
        knn.BruteForceKnn.asAdjacency(knn.BruteForceKnn.knnGraph(vecs, k))
      else {
        val step = math.max(1L, n / 256L)
        val queries = vecs.filter(col("vec_id") % step === 0)
        knn.BruteForceKnn.asAdjacency(
          org.apache.spark.sql.graft.TopKJoin.knn(queries, vecs, k))
      }
    val approx = mrdf.Mrdf.asAdjacency(edges)
    knn.Recall.recall(truth, approx).collect()(0).getDouble(0)
  }
}
