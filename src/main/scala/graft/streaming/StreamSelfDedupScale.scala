package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale measurement for the STREAMED SELF-dedup (SCALING.json,
  * round-13): q228's wave replay over the quote-web stress corpus —
  * the gram POSTING TABLE itself lives in keyed ListState, so this
  * measures the real state-store load of streamed self-dedup (every
  * arriving gram is written to state, unlike q222 whose corpus side is
  * a static probe table). Correctness is ASSERTED in-run (round-13
  * advice: a printed `equal=` flag relies on a human reading stdout):
  * the streamed span ROWS must equal the batch prefix-cap rule's span
  * rows — compared with `except` in both directions, so a
  * count-preserving mismatch fails too — or the harness throws and
  * the scale point cannot be recorded.
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
    var progress = Array.empty[org.apache.spark.sql.streaming.StreamingQueryProgress]
    val out = StreamSelfDedup.runReplay(spark, corpus, Some((src, parts)),
        onProgress = p => progress = p)
      .localCheckpoint()
    val nSpans = out.count()
    val streamSec = (System.nanoTime() - t1) / 1e9
    // state-footprint per batch (round-13 verdict #8): the posting
    // table lives in keyed state, so rows/bytes grow with every wave —
    // the number that sizes per-executor state at 100 TB shard grain
    progress.filter(_.stateOperators.nonEmpty).foreach { p =>
      val rows = p.stateOperators.map(_.numRowsTotal).sum
      val upd = p.stateOperators.map(_.numRowsUpdated).sum
      val mem = p.stateOperators.map(_.memoryUsedBytes).sum
      println(s"[stream-selfdedup-scale] batch=${p.batchId} " +
        s"inputRows=${p.numInputRows} stateRows=$rows rowsUpdated=$upd " +
        f"stateBytes=$mem (${mem / 1048576.0}%.1f MiB) " +
        f"batchSec=${p.batchDuration / 1000.0}%.1f")
    }
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
    val batchSpans = pr
      .withColumn("brk", when(col("pa") - lag(col("pa"), 1).over(w) === 1, 0)
        .otherwise(1))
      .withColumn("island", sum(col("brk")).over(w))
      .groupBy(col("doc_a"), col("doc_b"), col("d"), col("island"))
      .agg(min(col("pa")).as("a_start"),
        (max(col("pa")) + lit(n - 1)).as("a_end"),
        (max(col("pa")) - min(col("pa")) + lit(n)).as("len_tokens"))
      .select(col("doc_a"), col("a_start"), col("a_end"), col("doc_b"),
        (col("a_start") + col("d")).as("b_start"),
        (col("a_end") + col("d")).as("b_end"), col("len_tokens"))
      .localCheckpoint()
    val nBatch = batchSpans.count()
    val batchSec = (System.nanoTime() - t2) / 1e9
    // row-level equality, both directions — a count-preserving drift
    // (same span count, different spans) must fail the run, not pass
    // behind a matching count
    val spanCols = Seq("doc_a", "a_start", "a_end", "doc_b", "b_start",
      "b_end", "len_tokens").map(col)
    val missing = batchSpans.select(spanCols: _*)
      .except(out.select(spanCols: _*)).count()
    val extra = out.select(spanCols: _*)
      .except(batchSpans.select(spanCols: _*)).count()
    println(f"[stream-selfdedup-scale] srcBuildSec=$srcSec%.1f " +
      f"streamedSpans=$nSpans streamSec=$streamSec%.1f " +
      f"batchSpans=$nBatch batchSec=$batchSec%.1f " +
      s"missing=$missing extra=$extra")
    require(missing == 0 && extra == 0 && nSpans == nBatch,
      s"streamed self-dedup diverged from the batch prefix-cap rule: " +
        s"$missing batch spans missing from the stream, $extra streamed " +
        s"spans not in batch (counts $nSpans vs $nBatch) — the scale " +
        "point must not be recorded")
    spark.stop()
  }
}
