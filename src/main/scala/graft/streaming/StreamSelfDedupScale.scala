package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale measurement for the STREAMED SELF-dedup (SCALING.json,
  * round-13): q228's wave replay over the quote-web stress corpus —
  * the gram POSTING TABLE itself lives in keyed ListState, so this
  * measures the real state-store load of streamed self-dedup (every
  * arriving gram is written to state, unlike q222 whose corpus side is
  * a static probe table). Correctness is asserted in-run: streamed
  * spans must equal the batch prefix-cap rule computed Spark-side.
  *
  * Usage: `runMain graft.streaming.StreamSelfDedupScale [sfDir] [nDerived]` */
object StreamSelfDedupScale {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val nDerived = if (args.length > 1) args(1).toInt else 15000
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("StreamSelfDedupScale")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.text.ExactSubstr.MinTokens
    val corpus = graft.text.ExactSubstr
      .quoteWebCorpus(spark, sfDir, nDerived).localCheckpoint()
    val stats = corpus.agg(count(lit(1)),
      sum(size(split(col("text"), " ")))).collect()(0)
    println(s"[stream-selfdedup-scale] corpus docs=${stats.getLong(0)} " +
      s"tokens=${stats.getLong(1)}")
    val t0 = System.nanoTime()
    val (src, parts) = StreamSelfDedup.buildWaveReplayForTest(spark, corpus)
    val srcSec = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val out = StreamSelfDedup.runReplay(spark, corpus, Some((src, parts)))
      .localCheckpoint()
    val nSpans = out.count()
    val streamSec = (System.nanoTime() - t1) / 1e9
    // batch mirror of the streamed prefix-cap rule (the q228 oracle,
    // Spark-side) — equality asserted, wall reported
    val t2 = System.nanoTime()
    val g = graft.text.SpanDedup.positionalGrams(corpus, n)
      .withColumn("wave", pmod(col("doc_id"), lit(3L)))
    val kept = g.withColumn("prn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
          .orderBy(col("wave"), col("doc_id"), col("p"))))
      .filter(col("prn") <= graft.text.ExactSubstr.MaxOcc)
      .select(col("g"), col("doc_id").as("doc_a"), col("p").as("pa"),
        col("wave").as("wa"))
    val pr = kept.join(
        g.select(col("g"), col("doc_id").as("doc_b"), col("p").as("pb"),
          col("wave").as("wb")), Seq("g"))
      .filter(col("wb") > col("wa"))
      .select(col("doc_a"), col("doc_b"), (col("pb") - col("pa")).as("d"),
        col("pa"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_a"), col("doc_b"), col("d")).orderBy(col("pa"))
    val nBatch = pr
      .withColumn("brk", when(col("pa") - lag(col("pa"), 1).over(w) === 1, 0)
        .otherwise(1))
      .withColumn("island", sum(col("brk")).over(w))
      .groupBy(col("doc_a"), col("doc_b"), col("d"), col("island")).count()
      .count()
    val batchSec = (System.nanoTime() - t2) / 1e9
    println(f"[stream-selfdedup-scale] srcBuildSec=$srcSec%.1f " +
      f"streamedSpans=$nSpans streamSec=$streamSec%.1f " +
      f"batchSpans=$nBatch batchSec=$batchSec%.1f " +
      s"equal=${nSpans == nBatch}")
    spark.stop()
  }
}
