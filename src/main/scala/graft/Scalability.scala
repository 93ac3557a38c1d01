package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The reference's scalability harness (`testdatascalability.py:29-43`:
  * time MRDF per vector count, print (count, seconds) pairs) — without
  * its crash on the undefined `aargs.outputfile` at the end.
  *
  * Usage: `runMain graft.Scalability [sfDir] [count1,count2,...]`
  */
object Scalability {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val counts = (if (args.length > 1) args(1) else "500,1000,2000")
      .split(",").map(_.trim.toInt).toSeq
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
      val edges = mrdf.Mrdf.buildGraph(vecs, mrdf.MrdfQueries.testParams)
      val nEdges = edges.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"($n, $sec%.2f)  # edges=$nEdges")
      (n, sec)
    }
    println(results.map { case (n, s) => f"($n, $s%.2f)" }.mkString("[", ", ", "]"))
    spark.stop()
  }
}
