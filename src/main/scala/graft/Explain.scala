package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection main: prints `explain("formatted")` for declared
  * queries — the scale-readiness review loop (pushdown reached the
  * scan? small side broadcast? codegen spans wide?). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names: Seq[String] =
      if (args.length > 1) args(1).split(",").toSeq
      else Seq("knn_bruteforce", "q01_pricing_summary", "q02_filter_project",
        "q15_multi_join", "q25_ngram_jaccard", "q30_cosine_topk", "q07_range_join")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n======== $n ========")
      Registry.byName(n).run(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
