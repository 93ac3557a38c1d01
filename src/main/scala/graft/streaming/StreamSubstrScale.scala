package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale measurement for the STREAMED exact-substring span rule
  * (SCALING.json, round-13 / round-12 verdict #8): run q222's chunked
  * replay over the quote-web stress corpus (ExactSubstr's generator —
  * the same corpus behind `round12_exact_substr_scale`) instead of
  * only the suite corpora, and report spans + wall next to the batch
  * q213 walls on the same corpus. The static side is the doc_id%10=0
  * slice (q222's convention); arriving docs stream in 3 chunked
  * micro-batches with the per-(pair, diagonal) run state crossing both
  * boundaries.
  *
  * Usage: `runMain graft.streaming.StreamSubstrScale [sfDir] [nDerived]` */
object StreamSubstrScale {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val nDerived = if (args.length > 1) args(1).toInt else 15000
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("StreamSubstrScale")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = graft.text.ExactSubstr
      .quoteWebCorpus(spark, sfDir, nDerived).localCheckpoint()
    val stats = corpus.agg(count(lit(1)),
      sum(size(split(col("text"), " ")))).collect()(0)
    val static = corpus.filter(col("doc_id") % 10 === 0).localCheckpoint()
    val arriving = corpus.filter(col("doc_id") % 10 =!= 0).localCheckpoint()
    println(s"[stream-substr-scale] corpus docs=${stats.getLong(0)} " +
      s"tokens=${stats.getLong(1)} static=${static.count()} " +
      s"arriving=${arriving.count()}")
    // replay-source build measured apart (an index/ingest artifact,
    // not per-batch serving work)
    val t0 = System.nanoTime()
    val src = StreamSubstr.buildChunkReplayForTest(spark, arriving)
    val srcSec = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val out = StreamSubstr.runReplay(spark, static, arriving, Some(src))
      .localCheckpoint()
    val nSpans = out.count()
    val streamSec = (System.nanoTime() - t1) / 1e9
    // batch q213 on the same corpus, restricted the same way, for the
    // apples-to-apples wall (the full self-dedup batch walls live in
    // round12_exact_substr_scale)
    val t2 = System.nanoTime()
    val batchSpans = graft.text.ExactSubstr.sharedSubstrings(corpus)
      .filter((col("doc_a") % 10 === 0 && col("doc_b") % 10 =!= 0) ||
        (col("doc_b") % 10 === 0 && col("doc_a") % 10 =!= 0))
      .count()
    val batchSec = (System.nanoTime() - t2) / 1e9
    println(f"[stream-substr-scale] srcBuildSec=$srcSec%.1f " +
      f"streamedSpans=$nSpans streamSec=$streamSec%.1f " +
      f"batchCrossSpans=$batchSpans batchSec=$batchSec%.1f")
    spark.stop()
  }
}
