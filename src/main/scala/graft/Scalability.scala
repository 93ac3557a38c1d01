package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The reference's scalability harness (`testdatascalability.py:29-43`:
  * time MRDF per vector count, print (count, seconds) pairs) — without
  * its crash on the undefined `aargs.outputfile` at the end.
  *
  * Usage: `runMain graft.Scalability [sfDir] [count1,count2,...] [default]`
  *
  * With the third arg `default`, MRDF runs at the reference's default
  * parameters (k=30, ρ=15, α=150000 — the 100 TB regime, where any
  * test-scale N fits one block and division is a single pass) and each
  * run also reports recall vs the exact brute-force graph.
  */
object Scalability {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val counts = (if (args.length > 1) args(1) else "500,1000,2000")
      .split(",").map(_.trim.toInt).toSeq
    val useDefaults = args.length > 2 && args(2) == "default"
    val params = if (useDefaults) mrdf.Mrdf.Params() else mrdf.MrdfQueries.testParams
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("MRDFScalability")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val all = Tables.load(spark, sfDir, "embeddings")
    val results = counts.map { n =>
      val vecs = all.orderBy(col("vec_id")).limit(n)
      val t0 = System.nanoTime()
      val edges = mrdf.Mrdf.buildGraph(vecs, params)
      val nEdges = edges.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val recall =
        if (useDefaults) {
          val truth = knn.BruteForceKnn.asAdjacency(
            knn.BruteForceKnn.knnGraph(vecs, params.k))
          val r = knn.Recall.recall(truth, mrdf.Mrdf.asAdjacency(edges))
            .collect()(0).getDouble(0)
          f"  recall=$r%.4f"
        } else ""
      Checkpoints.release(edges)
      println(f"($n, $sec%.2f)  # edges=$nEdges$recall")
      (n, sec)
    }
    println(results.map { case (n, s) => f"($n, $s%.2f)" }.mkString("[", ", ", "]"))
    spark.stop()
  }
}
